"""Policy/value networks (flax.linen).

The reference trains SB3 MLP policies with a custom features extractor that
concatenates hand one-hots, joker MLP features and scalars into a 512-d torch
MLP (reference: train_balatro_agent.py:42-119). Rebuilt here as a single
actor-critic flax module over a flat observation vector; action-mask handling
is done at the logits (−inf on illegal actions), replacing SB3's
invalid-action penalty loop — invalid actions are impossible by construction.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ActorCritic(nn.Module):
    """Shared-torso MLP actor-critic.

    __call__(obs [.., D], mask [.., A]) -> (masked logits [.., A], value [..]).

    ``compute_dtype=jnp.bfloat16`` runs the matmuls on the MXU's native
    dtype (params and outputs stay float32) — the idiomatic TPU mixed
    precision for the learner's FLOPs.
    """

    n_actions: int
    hidden: Sequence[int] = (256, 256)
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, obs, mask=None):
        dt = self.compute_dtype
        x = obs.astype(dt) if dt else obs
        for h in self.hidden:
            x = nn.tanh(nn.Dense(
                h, kernel_init=nn.initializers.orthogonal(2 ** 0.5),
                dtype=dt)(x))
        logits = nn.Dense(self.n_actions, dtype=dt,
                          kernel_init=nn.initializers.orthogonal(0.01))(x)
        logits = logits.astype(jnp.float32)
        if mask is not None:
            logits = jnp.where(mask, logits, -1e9)
        value = nn.Dense(1, dtype=dt,
                         kernel_init=nn.initializers.orthogonal(1.0))(x)
        return logits, value[..., 0].astype(jnp.float32)
