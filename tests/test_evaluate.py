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


def test_evaluate_temperature_decoding():
    """Low-temperature sampled decoding runs, stays mask-legal (finite
    stats), and approaches the greedy policy's choices as T -> 0."""
    hooks = sim_env_hooks()
    cfg = PPOConfig(n_envs=16, rollout_len=4, epochs=1, minibatches=2,
                    hidden=(32,))
    init_fn, update_fn, policy_fn = make_ppo(hooks, cfg)
    ts = init_fn(jax.random.key(0))
    ts, _ = jax.jit(update_fn)(ts)
    cold = evaluate_policy(policy_fn, ts.params, hooks, n_episodes=16,
                           max_steps=16, greedy=False, temperature=1e-4,
                           obs_stats=ts.obs_stats)
    greedy = evaluate_policy(policy_fn, ts.params, hooks, n_episodes=16,
                             max_steps=16, greedy=True, greedy_antiloop=False,
                             obs_stats=ts.obs_stats)
    assert np.isfinite(cold["mean_reward"])
    # T->0 sampling == argmax decoding (same trajectories, same stats).
    assert cold["mean_reward"] == greedy["mean_reward"]
    warm = evaluate_policy(policy_fn, ts.params, hooks, n_episodes=16,
                           max_steps=16, greedy=False, temperature=0.5,
                           obs_stats=ts.obs_stats)
    assert np.isfinite(warm["mean_reward"])


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
