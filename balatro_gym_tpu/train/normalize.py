"""Running observation/reward normalization — VecNormalize, TPU-native.

The reference wraps envs in SB3 ``VecNormalize`` (hpc_train.py:68-72,
train_balatro_agent.py:319): running mean/var of observations and of
discounted returns, updated on every batch. Here the statistics are device
arrays inside the train state, updated with Chan's parallel-merge formula —
and merged across data-parallel shards with ``lax.pmean`` so every shard
normalizes identically (SURVEY §2.7 row 'reward/obs normalization sync').
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningStats:
    mean: jnp.ndarray   # [D] (or scalar for rewards)
    var: jnp.ndarray    # [D]
    count: jnp.ndarray  # scalar f32


def init_stats(dim: int | None = None) -> RunningStats:
    shape = () if dim is None else (dim,)
    return RunningStats(mean=jnp.zeros(shape, jnp.float32),
                        var=jnp.ones(shape, jnp.float32),
                        count=jnp.asarray(1e-4, jnp.float32))


def update_stats(rs: RunningStats, batch, axis_name: str | None = None) -> RunningStats:
    """Merge a batch of samples ([N, D] or [N]) into the running stats."""
    b_mean = jnp.mean(batch, axis=0)
    b_var = jnp.var(batch, axis=0)
    b_count = jnp.asarray(batch.shape[0], jnp.float32)
    if axis_name is not None:
        g_mean = jax.lax.pmean(b_mean, axis_name)
        # Pooled variance needs the between-shard term E[(m_i - m)^2], not
        # just the mean of within-shard variances.
        b_var = jax.lax.pmean(b_var + (b_mean - g_mean) ** 2, axis_name)
        b_mean = g_mean
        b_count = jax.lax.psum(b_count, axis_name)

    delta = b_mean - rs.mean
    tot = rs.count + b_count
    new_mean = rs.mean + delta * b_count / tot
    m_a = rs.var * rs.count
    m_b = b_var * b_count
    m2 = m_a + m_b + delta ** 2 * rs.count * b_count / tot
    return RunningStats(mean=new_mean, var=m2 / tot, count=tot)


def normalize(rs: RunningStats, x, clip: float = 10.0):
    return jnp.clip((x - rs.mean) / jnp.sqrt(rs.var + 1e-8), -clip, clip)


def normalize_fm(rs: RunningStats, x_fm, clip: float = 10.0):
    """Feature-major twin of :func:`normalize` for [D, E] activations
    (fused collection path, train/ppo.py `_rollout_fused`): same constants,
    same formula, stats broadcast over the env (lane) axis."""
    return jnp.clip((x_fm - rs.mean[:, None]) / jnp.sqrt(rs.var[:, None] + 1e-8),
                    -clip, clip)


def normalize_reward(rs: RunningStats, r, clip: float = 10.0):
    """SB3 semantics: rewards are scaled by return std, not centered."""
    return jnp.clip(r / jnp.sqrt(rs.var + 1e-8), -clip, clip)
