"""Extended regression fixtures — OUR recorded behavior, frozen.

The reference's fixture covers 5 joker-less trajectories; these extend the
locked surface to expert play on the flagship env and random play on the sim
engine under fixed seeds. Any future refactor that changes observable
behavior (scores, money, phases, rewards) fails here with a precise diff.
Regenerate deliberately with tests/fixtures/README-style intent only when a
behavior change is itself the intended fix.
"""
import json
from pathlib import Path

from balatro_gym_tpu.train.trajectories import (
    collect_expert_trajectories,
    collect_sim_trajectories,
)

FIXTURES = Path(__file__).parent / "fixtures"


def test_sim_regression_fixture():
    want = json.loads((FIXTURES / "sim_regression.json").read_text())
    got = collect_sim_trajectories(3, seed=100, max_steps=12)
    assert got == want


def test_expert_regression_fixture():
    want = json.loads((FIXTURES / "expert_regression.json").read_text())
    got = collect_expert_trajectories(2, seed=7, max_steps=40)
    assert got == want
