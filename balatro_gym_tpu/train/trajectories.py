"""Trajectory generation / recording tooling.

Rebuild of the reference's trajectory stack — ``TrajectoryCollector``
(run_trajectories.py:32-335), the fixture generator
(balatro_gym/balatro_sim_test.py:275-484) and the analyzer
(trajectory_analysis.py:6-97) — on the vectorized engines: rollouts run as
one jitted scan over thousands of envs, then transitions are exported host-
side in the fixture's JSON schema ({state, action, reward, next_state, done},
balatro_trajectories.json).
"""
from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.core.cards import SUIT_NAMES
from balatro_gym_tpu.engine import sim_env


def _sim_obs_dict(st, i=None):
    """SimEnvState -> the fixture's state schema (balatro_sim_test.py:333-359)."""
    g = (lambda a: a[i]) if i is not None else (lambda a: a)
    n = int(g(st.hand_n))
    hand = [[int(g(st.hand_rank)[k]), SUIT_NAMES[int(g(st.hand_suit)[k])], "none"]
            for k in range(n)]
    return {
        "money": int(g(st.money)),
        "ante": int(g(st.ante)),
        "hands_left": int(g(st.hands_left)),
        "discards_left": int(g(st.discards_left)),
        "score": int(g(st.score)),
        "blind_requirement": int(g(st.blind_requirement)),
        "hand_cards": hand,
        "jokers": [int(j) for j in np.asarray(g(st.jokers)) if int(j) > 0],
        "hand_levels": {},
        "deck_size": int(g(st.deck_n)),
        "consumables": 0,
    }


def collect_sim_trajectories(n_trajectories: int = 5, seed: int = 0,
                             max_steps: int = 16, policy: str = "random"):
    """Roll complete single-blind episodes and return fixture-schema dicts.

    policy: 'random' (masked-uniform, like run_trajectories.py's
    RandomPolicy) — per-episode device rollout, host-side recording.
    """
    step = jax.jit(sim_env.step_action)
    out = []
    for t in range(n_trajectories):
        key = jax.random.key(seed + t)
        st = sim_env.reset(key)
        traj = []
        for _ in range(max_steps):
            key, k_act = jax.random.split(key)
            mask = np.asarray(sim_env.action_mask(st))
            legal = np.flatnonzero(mask)
            if len(legal) == 0:
                break
            action = int(jax.random.choice(k_act, jnp.asarray(legal)))
            pre = _sim_obs_dict(st)
            st2, reward, done = step(st, jnp.int32(action))
            k = action % 5 + 1
            traj.append({
                "state": pre,
                "action": {
                    "type": "play_hand" if action < 5 else "discard",
                    "card_indices": list(range(k)),
                },
                "reward": float(reward),
                "next_state": _sim_obs_dict(st2),
                "done": bool(done),
            })
            st = st2
            if bool(done):
                break
        out.append(traj)
    return out


def collect_expert_trajectories(n_trajectories: int = 4, seed: int = 0,
                                max_steps: int = 64):
    """Expert demonstrations on the FLAGSHIP env (the reference
    TrajectoryGenerator's role, trajectory_gym.py:9-166 — which referenced
    nonexistent env kwargs; rebuilt on the working exhaustive expert).

    Returns fixture-style dicts with flagship observations.
    """
    from balatro_gym_tpu.engine import full_env
    from balatro_gym_tpu.train.expert import expert_action

    step = jax.jit(full_env.step)
    act = jax.jit(expert_action)
    obs_fn = jax.jit(full_env.observe)

    def obs_dict(st):
        o = jax.device_get(obs_fn(st))
        return {k: np.asarray(v).tolist() if np.asarray(v).ndim else
                int(np.asarray(v)) if np.asarray(v).dtype.kind in "iub"
                else float(np.asarray(v)) for k, v in o.items()
                if k != "action_mask"}

    out = []
    for t in range(n_trajectories):
        st = full_env.reset(jax.random.key(seed + t))
        traj = []
        for _ in range(max_steps):
            action = int(act(st))
            pre = obs_dict(st)
            st2, reward, done = step(st, jnp.int32(action))
            traj.append({
                "state": pre,
                "action": {"type": "env_action", "id": action},
                "reward": float(reward),
                "next_state": obs_dict(st2),
                "done": bool(done),
            })
            st = st2
            if bool(done):
                break
        out.append(traj)
    return out


def save_trajectories(trajectories, path: str | Path) -> None:
    Path(path).write_text(json.dumps(trajectories, indent=2))


def save_trajectories_pickle(trajectories, path: str | Path) -> None:
    """Pickle batch saver (save_traj.py:85-226 parity)."""
    import pickle

    with open(path, "wb") as f:
        pickle.dump(trajectories, f)


def load_trajectories_pickle(path: str | Path):
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


def analyze_trajectories(trajectories):
    """Summary stats (trajectory_analysis.py semantics): per-trajectory
    length, total reward, final score; aggregate means."""
    rows = []
    for traj in trajectories:
        rows.append({
            "transitions": len(traj),
            "total_reward": sum(t["reward"] for t in traj),
            "final_score": traj[-1]["next_state"].get(
                "score", traj[-1]["next_state"].get("chips_scored", 0)) if traj else 0,
            "plays": sum(1 for t in traj if t["action"]["type"] == "play_hand"),
            "discards": sum(1 for t in traj if t["action"]["type"] == "discard"),
        })
    agg = {
        "n_trajectories": len(rows),
        "mean_reward": float(np.mean([r["total_reward"] for r in rows])) if rows else 0.0,
        "mean_final_score": float(np.mean([r["final_score"] for r in rows])) if rows else 0.0,
    }
    return rows, agg


def plot_trajectories(trajectories, out_path: str | Path = "trajectory_analysis.png"):
    """The reference ``TrajectoryAnalyzer`` chart panel, rebuilt for our
    trajectory format (reference: trajectory_analysis.py:6-97 — itself
    unimportable as written: it uses ``Path`` without importing it, :10).

    2x2 panel: total reward per episode, final score per episode, decision
    (action-type) distribution, and per-episode length — saved to
    ``out_path`` (headless Agg backend; no ``plt.show``).
    Returns the per-trajectory rows from :func:`analyze_trajectories`.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows, agg = analyze_trajectories(trajectories)
    fig, axes = plt.subplots(2, 2, figsize=(12, 10))

    axes[0, 0].plot([r["total_reward"] for r in rows])
    axes[0, 0].set_title("Total Reward per Episode")
    axes[0, 0].set_xlabel("Episode")
    axes[0, 0].set_ylabel("Total Reward")

    axes[0, 1].plot([r["final_score"] for r in rows])
    axes[0, 1].set_title("Final Score per Episode")
    axes[0, 1].set_xlabel("Episode")
    axes[0, 1].set_ylabel("Score")

    from collections import Counter
    decisions = Counter(t["action"]["type"] for traj in trajectories
                        for t in traj)
    axes[1, 0].bar(list(decisions.keys()),
                   list(decisions.values()))
    axes[1, 0].set_title("Decision Type Distribution")
    axes[1, 0].tick_params(axis="x", rotation=45)

    axes[1, 1].plot([r["transitions"] for r in rows])
    axes[1, 1].set_title("Trajectory Length per Episode")
    axes[1, 1].set_xlabel("Episode")
    axes[1, 1].set_ylabel("Transitions")

    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return rows, agg


def main():  # pragma: no cover
    import argparse

    p = argparse.ArgumentParser(description="Generate sim trajectories")
    p.add_argument("--n", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="trajectories.json")
    p.add_argument("--plot", type=str, default="",
                   help="write the TrajectoryAnalyzer chart panel here")
    args = p.parse_args()
    trajs = collect_sim_trajectories(args.n, args.seed)
    save_trajectories(trajs, args.out)
    rows, agg = analyze_trajectories(trajs)
    if args.plot:
        plot_trajectories(trajs, args.plot)
    print(json.dumps(agg))


if __name__ == "__main__":  # pragma: no cover
    main()
