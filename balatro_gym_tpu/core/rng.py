"""Named-stream RNG over jax.random.

The reference keeps 16 independent `random.Random` streams keyed by subsystem
name (balatro_gym/balatro_env_2.py:84-159, `DeterministicRNG`). We mirror the
*structure* — independent, individually seedable streams per subsystem — using
counter-based key derivation: stream key = fold_in(master, stream_id), draw key
= fold_in(stream_key, counter). State is a single [NUM_STREAMS] uint32 counter
array inside the env pytree, so the whole RNG state is checkpointable and
vmappable for free.

Bit-level parity with CPython's Mersenne Twister is impossible and not
required (SURVEY §7): the parity fixture's chance nodes are action-driven.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

STREAMS = (
    "deck_shuffle", "card_draw", "shop_generation", "shop_reroll",
    "joker_effects", "blind_selection", "skip_rewards", "pack_opening",
    "voucher_appearance", "boss_abilities", "random_events",
    "card_enhancement", "edition_rolls", "seal_applications",
    "consumable_effects", "score_variance",
)
NUM_STREAMS = len(STREAMS)
STREAM_ID = {name: i for i, name in enumerate(STREAMS)}


def init_counters():
    """Fresh per-stream draw counters."""
    return jnp.zeros((NUM_STREAMS,), dtype=jnp.uint32)


def stream_key(master_key, stream: str | int):
    sid = STREAM_ID[stream] if isinstance(stream, str) else stream
    return jax.random.fold_in(master_key, sid)


def next_key(master_key, counters, stream: str | int):
    """Derive the next key for `stream`; returns (key, new_counters).

    Pure and fixed-shape: usable inside jit/vmap.
    """
    sid = STREAM_ID[stream] if isinstance(stream, str) else stream
    key = jax.random.fold_in(stream_key(master_key, sid), counters[sid])
    return key, counters.at[sid].add(1)


I32_MIN = -(2 ** 31)


def sort_key_i32(bits, mask):
    """Sign-flip u32 draw keys into i32 so (arg)max ordering runs in the
    SIGNED domain; masked-out entries become I32_MIN (below any drawn key).

    Why: the engines' uniform-without-replacement draws (shop joker top-3,
    Immolate's destroy-5, The Hook's discard-2) order iid u32 keys. XLA:TPU
    mis-orders ``uint32`` argmax/max reductions inside large fused programs
    (observed on v5e: engine-on-TPU picked different slots than
    engine-on-CPU and than the Pallas kernel, scripts/debug_fused_case.py;
    a standalone u32 argmax compiles fine — only the fused formulation
    breaks). The sign-flipped i32 domain is order-isomorphic to unsigned
    order, is what the fused kernels already use (Mosaic has no unsigned
    max lowering at all), and makes every backend agree bit-for-bit.

    Use ``.at[j].set(I32_MIN)`` to knock out picked entries when iterating.
    """
    flipped = jax.lax.bitcast_convert_type(
        jnp.asarray(bits, jnp.uint32) ^ jnp.uint32(0x80000000), jnp.int32)
    return jnp.where(mask, flipped, jnp.int32(I32_MIN))
