"""Gym shell for the flagship env: contract, dtypes, checkpointing,
determinism + masking validators, and PPO training on the full env."""
import numpy as np
import pytest

from balatro_gym_tpu.envs import BalatroEnvValidator, BalatroGymEnv


@pytest.fixture(scope="module")
def env():
    return BalatroGymEnv(seed=0)


def test_reset_obs_dtypes(env):
    obs, info = env.reset(seed=0)
    assert obs["hand"].dtype == np.int8
    assert obs["chips_scored"].dtype == np.int64
    assert obs["ante"].dtype == np.int16
    assert obs["joker_ids"].shape == (10,)
    assert obs["consumables"].shape == (5,)
    assert obs["action_mask"].shape == (60,)
    assert int(obs["phase"]) == 2  # BLIND_SELECT
    assert int(obs["money"]) == 4


def test_random_episode_runs(env):
    obs, _ = env.reset(seed=1)
    rng = np.random.default_rng(0)
    for _ in range(60):
        legal = np.flatnonzero(obs["action_mask"])
        assert len(legal) > 0
        obs, r, done, trunc, _ = env.step(int(rng.choice(legal)))
        assert np.isfinite(r)
        if done:
            break


def test_save_load_roundtrip(env):
    obs, _ = env.reset(seed=2)
    env.step(45)
    saved = env.save_state()
    obs1, r1, d1, _, _ = env.step(2)
    env.load_state(saved)
    obs2, r2, d2, _, _ = env.step(2)
    assert r1 == r2 and d1 == d2
    for k in obs1:
        assert np.array_equal(obs1[k], obs2[k]), k


def test_validator_determinism():
    assert BalatroEnvValidator.validate_determinism(seed=42, steps=40)


def test_validator_masking():
    assert BalatroEnvValidator.validate_action_masking(seed=7, steps=25)


def test_ppo_trains_on_full_env():
    from balatro_gym_tpu.train.ppo import PPOConfig, full_env_hooks, train

    ts, metrics = train(
        num_updates=1,
        cfg=PPOConfig(n_envs=8, rollout_len=4, epochs=1, minibatches=2,
                      hidden=(32,)),
        hooks=full_env_hooks())
    assert np.isfinite(float(metrics["loss"]))
