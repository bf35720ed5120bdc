"""Pallas TPU kernels for the batched hand-histogram primitive.

The gather-free scoring pipeline (ops/scoring.py) is built on one compute
primitive: per-env histograms of card ranks/suits under a mask, consumed by
table matmuls. XLA already fuses the jnp formulation well; this module
provides the same primitive as a hand-written Pallas kernel — one VMEM pass
producing rank-histogram [B,16], suit-histogram [B,8] and masked chip sum
[B,1] per tile of envs — as the template for further kernel work (and a
measurable A/B against the XLA fusion).

Output minor dims are padded to TPU-friendly sizes (16/8 lanes used of a
128-lane tile); callers slice [:, :15] / [:, :5].

Use ``hand_histograms(..., interpret=True)`` on CPU (tests); on TPU the
kernel compiles natively and is bit-exact vs the reference formulation.

Measured A/B on the v5e chip (8192x8, standalone dispatch): pallas ~2.1ms
vs XLA fusion ~1.0ms per call — XLA wins for this small op, so the jnp
formulation stays in production and this kernel serves as the validated
template for future ops that XLA fuses poorly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from balatro_gym_tpu.core.cards import RANK_CHIPS

# Plain-numpy constant: jax-array captures are rejected inside pallas kernels.
_CHIP_TABLE = np.concatenate(
    [np.asarray(RANK_CHIPS, np.float32), np.zeros(1, np.float32)])

TILE_B = 256
N_CARDS = 8
R_PAD = 16  # ranks 0..14 padded
S_PAD = 8   # suits 0..4 padded


def _kernel(ranks_ref, suits_ref, mask_ref, chip_table_ref,
            rhist_ref, shist_ref, chips_ref):
    ranks = ranks_ref[:]            # [TILE_B, 8] i32
    suits = suits_ref[:]
    mask = mask_ref[:]              # [TILE_B, 8] f32 (0/1)

    # One-hot compare-and-reduce, fully in VMEM.
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, R_PAD), 2)
    r_oh = (ranks[:, :, None] == r_iota).astype(jnp.float32) * mask[:, :, None]
    rhist_ref[:] = jnp.sum(r_oh, axis=1)

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S_PAD), 2)
    s_oh = (suits[:, :, None] == s_iota).astype(jnp.float32) * mask[:, :, None]
    shist_ref[:] = jnp.sum(s_oh, axis=1)

    chips_ref[:] = rhist_ref[:] @ chip_table_ref[:].reshape(R_PAD, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hand_histograms(ranks, suits, mask, *, interpret: bool = False):
    """Batched masked histograms. ranks/suits [B,8] i32, mask [B,8] bool.

    Returns (rank_hist [B,16] f32, suit_hist [B,8] f32, chip_sum [B,1] f32).
    B must be a multiple of TILE_B.
    """
    B = ranks.shape[0]
    assert B % TILE_B == 0, f"B={B} must be a multiple of {TILE_B}"
    grid = (B // TILE_B,)
    blk = lambda w: pl.BlockSpec((TILE_B, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((1, R_PAD), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[blk(N_CARDS), blk(N_CARDS), blk(N_CARDS), table_spec],
        out_specs=(blk(R_PAD), blk(S_PAD), blk(1)),
        out_shape=(
            jax.ShapeDtypeStruct((B, R_PAD), jnp.float32),
            jax.ShapeDtypeStruct((B, S_PAD), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        interpret=interpret,
    )(ranks, suits, mask.astype(jnp.float32),
      jnp.asarray(_CHIP_TABLE).reshape(1, R_PAD))


def hand_histograms_reference(ranks, suits, mask):
    """The jnp formulation (what ops/scoring uses inside the fused step)."""
    m = mask.astype(jnp.float32)
    r_oh = (ranks[:, :, None] == jnp.arange(R_PAD)).astype(jnp.float32)
    s_oh = (suits[:, :, None] == jnp.arange(S_PAD)).astype(jnp.float32)
    rhist = jnp.einsum("bc,bcr->br", m, r_oh)
    shist = jnp.einsum("bc,bcs->bs", m, s_oh)
    chip_table = jnp.concatenate(
        [RANK_CHIPS.astype(jnp.float32), jnp.zeros(1, jnp.float32)])
    chips = rhist @ chip_table.reshape(R_PAD, 1)
    return rhist, shist, chips
