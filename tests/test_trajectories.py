"""Trajectory tooling: sim collection schema, expert demos, pickle round-trip."""
import json

import numpy as np

from balatro_gym_tpu.train.trajectories import (
    analyze_trajectories,
    collect_expert_trajectories,
    collect_sim_trajectories,
    load_trajectories_pickle,
    save_trajectories,
    save_trajectories_pickle,
)


def test_sim_trajectories_schema(tmp_path):
    trajs = collect_sim_trajectories(2, seed=3, max_steps=6)
    assert len(trajs) == 2
    tr = trajs[0][0]
    assert set(tr) == {"state", "action", "reward", "next_state", "done"}
    assert set(tr["state"]) >= {"money", "ante", "hands_left", "discards_left",
                                "score", "blind_requirement", "hand_cards",
                                "deck_size"}
    assert tr["action"]["type"] in ("play_hand", "discard")
    p = tmp_path / "t.json"
    save_trajectories(trajs, p)
    assert json.loads(p.read_text())[0][0]["state"]["money"] == tr["state"]["money"]


def test_expert_trajectories_progress():
    trajs = collect_expert_trajectories(1, seed=0, max_steps=30)
    tr = trajs[0]
    assert len(tr) > 3
    # The expert should beat at least the first blind (phase reaches SHOP=1).
    assert any(t["next_state"]["phase"] == 1 for t in tr)
    # All actions legal: no -1 rewards.
    assert all(t["reward"] != -1.0 for t in tr)


def test_pickle_roundtrip(tmp_path):
    trajs = collect_sim_trajectories(1, seed=0, max_steps=4)
    p = tmp_path / "t.pkl"
    save_trajectories_pickle(trajs, p)
    back = load_trajectories_pickle(p)
    assert back == trajs


def test_analyzer():
    trajs = collect_sim_trajectories(3, seed=1, max_steps=8)
    rows, agg = analyze_trajectories(trajs)
    assert agg["n_trajectories"] == 3
    assert len(rows) == 3
    assert all(r["transitions"] >= 1 for r in rows)


def test_plot_trajectories(tmp_path):
    """The reference TrajectoryAnalyzer chart panel (trajectory_analysis.py:
    60-97), rebuilt for our trajectory format: writes a real PNG."""
    from balatro_gym_tpu.train.trajectories import (collect_sim_trajectories,
                                                    plot_trajectories)

    trajs = collect_sim_trajectories(3, seed=0)
    out = tmp_path / "panel.png"
    rows, agg = plot_trajectories(trajs, out)
    assert out.exists() and out.stat().st_size > 1000
    assert len(rows) == 3 and agg["n_trajectories"] == 3
