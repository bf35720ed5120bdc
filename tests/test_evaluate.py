"""evaluate_policy: runs, respects normalization stats, transcript works."""
import numpy as np

import jax

from balatro_gym_tpu.train.evaluate import evaluate_policy, transcript_episode
from balatro_gym_tpu.train.ppo import PPOConfig, make_ppo, sim_env_hooks


def test_evaluate_trained_policy_with_stats():
    hooks = sim_env_hooks()
    cfg = PPOConfig(n_envs=16, rollout_len=4, epochs=1, minibatches=2,
                    hidden=(32,))
    init_fn, update_fn, policy_fn = make_ppo(hooks, cfg)
    step = jax.jit(update_fn)
    ts = init_fn(jax.random.key(0))
    for _ in range(2):
        ts, _ = step(ts)
    stats = evaluate_policy(policy_fn, ts.params, hooks, n_episodes=8,
                            max_steps=16, obs_stats=ts.obs_stats)
    assert stats["episodes"] > 0
    assert np.isfinite(stats["mean_reward"])
    # Without stats the policy still runs (different inputs, still finite).
    stats2 = evaluate_policy(policy_fn, ts.params, hooks, n_episodes=8,
                             max_steps=16)
    assert np.isfinite(stats2["mean_reward"])


def test_transcript_episode():
    from balatro_gym_tpu.envs import BalatroGymEnv

    env = BalatroGymEnv(seed=0)
    rng = np.random.default_rng(0)

    def select(obs):
        legal = np.flatnonzero(obs["action_mask"])
        return rng.choice(legal)

    lines = transcript_episode(env, select, max_steps=10)
    assert len(lines) >= 1
    assert lines[0].startswith("t=0")
