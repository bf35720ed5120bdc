"""Small 10-action env: contract, scoring, masks."""
import numpy as np
import pytest

from balatro_gym_tpu.envs.small_env import BalatroSmallGymEnv


def test_contract_and_episode():
    env = BalatroSmallGymEnv(chip_threshold=300)
    obs, _ = env.reset()
    assert obs["hand"].shape == (8,)
    assert obs["deck"]["cards"].shape == (52,)
    mask = env.action_masks()
    # No highlights yet: only highlight actions legal.
    assert not mask[0] and not mask[1]
    assert mask[2:].all()

    # Highlight two cards -> play/discard become legal.
    env.step(2)
    env.step(3)
    mask = env.action_masks()
    assert mask[0] and mask[1]
    assert not mask[2] and not mask[3]  # no duplicate highlight

    obs, r, done, _, _ = env.step(0)  # play
    assert r > 0  # dense reward = chips*mult
    assert int(obs["round_hands"]) == 3
    assert obs["deck"]["cards_played"].sum() == 2


def test_invalid_action_raises():
    env = BalatroSmallGymEnv()
    env.reset()
    with pytest.raises(RuntimeError):
        env.step(0)  # play with nothing highlighted


def test_sparse_reward_mode():
    env = BalatroSmallGymEnv(chip_threshold=10, reward_dense=False)
    env.reset()
    env.step(2)
    env.step(3)
    obs, r, done, _, _ = env.step(0)
    # Pair of low cards scores >= 10 -> threshold met -> win payout only.
    if done:
        assert r == 10.0
    else:
        assert r == 0.0
