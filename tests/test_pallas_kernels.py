"""Pallas hand-histogram kernel vs the jnp reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.ops.pallas_kernels import (
    TILE_B,
    hand_histograms,
    hand_histograms_reference,
)


def test_pallas_histograms_match_reference():
    rng = np.random.default_rng(0)
    B = 2 * TILE_B
    ranks = jnp.asarray(rng.integers(0, 15, size=(B, 8)), jnp.int32)
    suits = jnp.asarray(rng.integers(0, 5, size=(B, 8)), jnp.int32)
    mask = jnp.asarray(rng.random((B, 8)) < 0.6)
    got = hand_histograms(ranks, suits, mask, interpret=True)
    want = hand_histograms_reference(ranks, suits, mask)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_pallas_chip_sum_exact():
    ranks = jnp.zeros((TILE_B, 8), jnp.int32).at[0, :5].set(
        jnp.asarray([10, 11, 12, 13, 14], jnp.int32))
    suits = jnp.zeros((TILE_B, 8), jnp.int32)
    mask = jnp.zeros((TILE_B, 8), bool).at[0, :5].set(True)
    _, _, chips = hand_histograms(ranks, suits, mask, interpret=True)
    assert float(chips[0, 0]) == 51.0  # 10+10+10+10+11
