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


class StructuredActorCritic(nn.Module):
    """Three-branch features extractor + actor-critic heads — the reference's
    ``BalatroFeaturesExtractor`` intent (train_balatro_agent.py:42-119),
    rebuilt to actually run.

    The reference's own extractor CANNOT execute: its ``joker_net`` declares
    ``nn.Linear(10*16, 128)`` but is fed the raw 10-d ``joker_ids`` vector
    (:61,:99-100), and ``game_state_net`` declares ``nn.Linear(32, 64)`` but
    receives the 21-d concat built at :104-115 — both matmuls raise on the
    first forward, so SB3 training with this extractor crashes immediately.
    This rebuild keeps its architecture (hand branch 256→128, joker branch
    128→64, game-state branch 64→32, concat → 512→512, ReLU throughout) with
    the dimensions corrected to our flat observation layout
    (``full_env.observe_vector``): hand one-hots [0:136], joker ids
    [136:141], everything else (levels/shop/phase/scalars) [141:D].

    ~490k params vs the flat ActorCritic(256,256)'s ~130k; A/B at equal
    params against ActorCritic(hidden=(576,576)) — docs/PERF.md records the
    comparison. NOT compatible with ``PPOConfig.fused_rollout`` (the
    feature-major kernel path mirrors the plain Dense stack and asserts on
    anything else).
    """

    n_actions: int
    hand_dim: int = 8 * 17   # observe_vector's per-position rank+suit one-hots
    joker_dim: int = 5
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, obs, mask=None):
        dt = self.compute_dtype
        x = obs.astype(dt) if dt else obs
        hand = x[..., :self.hand_dim]
        jok = x[..., self.hand_dim:self.hand_dim + self.joker_dim]
        rest = x[..., self.hand_dim + self.joker_dim:]

        def mlp(z, widths):
            for w in widths:
                z = nn.relu(nn.Dense(
                    w, dtype=dt,
                    kernel_init=nn.initializers.orthogonal(2 ** 0.5))(z))
            return z

        h = mlp(hand, (256, 128))   # hand_net (:55-60)
        j = mlp(jok, (128, 64))     # joker_net (:62-67)
        g = mlp(rest, (64, 32))     # game_state_net (:69-74)
        z = mlp(jnp.concatenate([h, j, g], axis=-1), (512, 512))  # :77-83
        logits = nn.Dense(self.n_actions, dtype=dt,
                          kernel_init=nn.initializers.orthogonal(0.01))(z)
        logits = logits.astype(jnp.float32)
        if mask is not None:
            logits = jnp.where(mask, logits, -1e9)
        value = nn.Dense(1, dtype=dt,
                         kernel_init=nn.initializers.orthogonal(1.0))(z)
        return logits, value[..., 0].astype(jnp.float32)


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
