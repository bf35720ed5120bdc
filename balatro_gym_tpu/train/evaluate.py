"""Policy evaluation — the reference's trained-agent test path
(train_balatro_agent.py:538-601: run N episodes, report stats, optional
episode transcript instead of video).

Evaluation is vectorized: N episodes run as vmapped envs in one scan; the
transcript option replays one episode host-side through the Gym shell.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def evaluate_policy(policy_fn: Callable, params: Any, hooks, n_episodes: int = 64,
                    max_steps: int = 256, seed: int = 0, greedy: bool = True,
                    obs_stats=None):
    """Run one episode per env lane; returns aggregate stats.

    policy_fn(params, obs [B,D], mask [B,A]) -> (logits, value).
    obs_stats: pass TrainState.obs_stats when the policy was trained with
    the default observation normalization — eval inputs must match the
    training distribution.
    """
    from balatro_gym_tpu.train.normalize import normalize

    B = n_episodes
    states = jax.vmap(hooks.reset)(jax.random.split(jax.random.key(seed), B))

    has_ante = hasattr(states, "ante")  # progression stat for the full env

    def body(carry, k):
        sts, ep_rew, ep_len, done_flag, max_ante = carry
        obs = jax.vmap(hooks.observe)(sts)
        if obs_stats is not None:
            obs = normalize(obs_stats, obs)
        mask = jax.vmap(hooks.action_mask)(sts)
        logits, _ = policy_fn(params, obs, mask)
        action = jnp.where(greedy, jnp.argmax(logits, -1),
                           jax.random.categorical(k, logits))
        sts2, rew, done = jax.vmap(hooks.step_autoreset)(sts, action)
        live = ~done_flag
        ep_rew = ep_rew + jnp.where(live, rew, 0.0).astype(jnp.float32)
        ep_len = ep_len + live.astype(jnp.int32)
        if has_ante:  # track per-lane peak ante while the episode is live
            max_ante = jnp.maximum(max_ante, jnp.where(live, sts.ante, 0))
        done_flag = done_flag | done
        if has_ante:
            # Also fold in the post-step state so an ante advance on the
            # final scan step is observed; lanes whose episode just ended
            # are excluded (sts2 is the autoreset state there).
            max_ante = jnp.maximum(max_ante,
                                   jnp.where(~done_flag, sts2.ante, 0))
        return (sts2, ep_rew, ep_len, done_flag, max_ante), None

    init = (states, jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32),
            jnp.zeros(B, bool), jnp.zeros(B, jnp.int32))
    (states, ep_rew, ep_len, done_flag, max_ante), _ = jax.lax.scan(
        body, init, jax.random.split(jax.random.key(seed + 1), max_steps))
    stats = {
        "episodes": int(np.sum(np.asarray(done_flag))),
        "mean_reward": float(np.mean(np.asarray(ep_rew))),
        "mean_length": float(np.mean(np.asarray(ep_len))),
        "max_reward": float(np.max(np.asarray(ep_rew))),
    }
    if has_ante:
        stats["mean_ante"] = float(np.mean(np.asarray(max_ante)))
        stats["max_ante"] = int(np.max(np.asarray(max_ante)))
    return stats


def transcript_episode(env, select_action, max_steps: int = 200) -> list[str]:
    """Replay one episode through a Gym shell, returning text lines (the
    reference's video path becomes a transcript — no display on TPU hosts)."""
    lines = []
    obs, _ = env.reset()
    total = 0.0
    for t in range(max_steps):
        action = int(select_action(obs))
        obs, r, done, trunc, info = env.step(action)
        total += r
        lines.append(f"t={t} a={action} r={r:+.2f} phase={int(obs['phase'])}"
                     f" ante={int(obs.get('ante', 0))}")
        if done:
            lines.append(f"episode done: total reward {total:.2f}")
            break
    return lines
