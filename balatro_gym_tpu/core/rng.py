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
