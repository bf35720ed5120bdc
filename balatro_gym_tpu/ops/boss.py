"""Boss blinds as dense tables + branch-free modifiers.

Mirrors ``BossBlindManager`` (reference: balatro_gym/boss_blinds.py:300-532)
as consumed by the flagship env (balatro_env_2.py:1269-1294, 677-680,
744-755, 788-794, 936-948). Boss ids match the reference enum values 1..28
(boss_blinds.py:18-47, auto() from 1).

Bug-faithful no-ops (each verified against the reference):

* Suit debuffs (The Goad/Window/Head/Club) compare a ``Suit`` IntEnum against
  the string 'Spades' etc. (boss_blinds.py:447-455) — never true, so these
  bosses do nothing.
* The Tooth's money penalty and The Serpent's force-draw are written into a
  throwaway ``to_dict()`` copy (balatro_env_2.py:790-794 re-reads a FRESH
  dict) — they never reach the state.
* The Amber's ``active_jokers`` modification is ignored by the env
  (balatro_env_2.py:1278-1286 reads only discards/hand_size/hands).
* The Crimson/Cerulean have no handler at all.

What DOES act: The Wall (2× chips), Water/Manacle/Needle activation mods,
Hook/Wheel/House/Mark/Fish on-hand-drawn effects, Psychic/Eye/Mouth/Verdant
play restrictions, Flint/Oxide/Arm + Plant/Violet/Pillar scoring ratios.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.core import pow_tables as PT
from balatro_gym_tpu.core import rng as R

_I64 = jax.dtypes.canonicalize_dtype(jnp.int64)  # i64 under x64, i32 in production (no dtype warnings)
_F64 = jax.dtypes.canonicalize_dtype(jnp.float64)

N_BOSS = 29  # ids 1..28; row 0 unused

(HOOK, WALL, WHEEL, HOUSE, MARK, FISH, PSYCHIC, GOAD, WATER, WINDOW, MANACLE,
 EYE, MOUTH, PLANT, SERPENT, PILLAR, NEEDLE, HEAD, CLUB, TOOTH, FLINT, OXIDE,
 ARM, VIOLET, VERDANT, AMBER, CRIMSON, CERULEAN) = range(1, 29)

BOSS_NAMES = (
    "", "The Hook", "The Wall", "The Wheel", "The House", "The Mark",
    "The Fish", "The Psychic", "The Goad", "The Water", "The Window",
    "The Manacle", "The Eye", "The Mouth", "The Plant", "The Serpent",
    "The Pillar", "The Needle", "The Head", "The Club", "The Tooth",
    "The Flint", "The Oxide", "The Arm", "The Violet", "The Verdant",
    "The Amber", "The Crimson", "The Cerulean",
)

_mult = np.ones(N_BOSS, np.float64)
_mult[WALL] = 2.0  # boss_blinds.py:84
BOSS_CHIP_MULT = jnp.asarray(_mult)

_money = np.full(N_BOSS, 5, np.int32)  # all money_reward=5
_money[0] = 0
BOSS_MONEY_REWARD = jnp.asarray(_money)


def select_boss(key):
    """Uniform over the 28 types (boss_blinds.py:522-532)."""
    return jax.random.randint(key, (), 1, N_BOSS, dtype=jnp.int32)


def activation_mods(boss_id):
    """(discards_override, hand_size_delta, hands_override); override −1 =
    no change (boss_blinds.py:327-339)."""
    disc = jnp.where(boss_id == WATER, 0, -1)
    hsize = jnp.where(boss_id == MANACLE, -1, 0)
    hands = jnp.where(boss_id == NEEDLE, 1, -1)
    return disc, hsize, hands


def can_play(boss_id, active, ht, n_played, played_types_bits, verdant_req):
    """Play restriction (boss_blinds.py:380-407). ht: int hand type;
    played_types_bits: u32 bitset of hand types scored this round."""
    ht_bit = (played_types_bits >> ht.astype(jnp.uint32)) & 1
    psychic_ok = (boss_id != PSYCHIC) | (n_played == 5)
    eye_ok = (boss_id != EYE) | (ht_bit == 0)
    mouth_ok = (boss_id != MOUTH) | (played_types_bits == 0) | (ht_bit == 1)
    verdant_ok = (boss_id != VERDANT) | (n_played >= verdant_req)
    return ~active | (psychic_ok & eye_ok & mouth_ok & verdant_ok)


def on_hand_drawn(key, boss_id, first_hand, ranks, present):
    """(face_down [8] bool, forced_discard [8] bool) for a fresh hand
    (boss_blinds.py:343-378). Hook picks 2 random held positions; Wheel
    flips each with p=1/7; House flips all on the first hand; Mark flips
    J/Q/K; Fish flips all after the first hand."""
    n = ranks.shape[0]
    k_hook, k_wheel = jax.random.split(key)

    # Hook: 2 distinct random positions among present cards — top-2 of iid
    # uniform u32 keys (uniform without replacement; integer keys so the
    # fused kernel replays the draws bit-exactly via ops/kernel_rng).
    # Iterated argmax — argsort lowers to a sort on TPU and this runs every
    # step.
    # Sign-flipped i32 ordering (core.rng.sort_key_i32): u32 argmax
    # mis-orders on XLA:TPU inside fused programs; i32 matches the kernel.
    g = R.sort_key_i32(jax.random.bits(k_hook, (n,), jnp.uint32), present)
    j1 = jnp.argmax(g)
    j2 = jnp.argmax(g.at[j1].set(jnp.int32(R.I32_MIN)))
    # One-hot OR, NOT a bool scatter-set: XLA:TPU silently drops dynamic-index BOOL scatter updates in vmapped programs
    # (see core.rng.sort_key_i32 / consumable_logic Immolate notes).
    pos = jnp.arange(n)
    hook_pick = (((pos == j1) | (pos == j2))
                 & present & (jnp.sum(present) >= 2))

    wheel = present & (jax.random.uniform(k_wheel, (n,)) < 1.0 / 7.0)
    house = present & first_hand
    mark = present & (ranks >= 11) & (ranks <= 13)
    fish = present & ~first_hand

    face = jnp.where(boss_id == WHEEL, wheel,
                     jnp.where(boss_id == HOUSE, house,
                               jnp.where(boss_id == MARK, mark,
                                         jnp.where(boss_id == FISH, fish,
                                                   jnp.zeros(n, bool)))))
    discard = jnp.where(boss_id == HOOK, hook_pick, jnp.zeros(n, bool))
    return face, discard


def scoring_ratio(boss_id, active, base_chips, base_mult, ranks, sel,
                  played_before):
    """The env's chip_ratio × mult_ratio (balatro_env_2.py:744-755) from
    ``modify_scoring`` (boss_blinds.py:409-445).

    base_chips/base_mult: level-adjusted ints from the score engine.
    played_before: [8] bool — selected card was played earlier this round
    (The Pillar, via object identity in the reference).
    Suit debuffs are dead (string-compare bug) and omitted.
    """
    f = _F64 if jax.config.jax_enable_x64 else jnp.float32
    c = base_chips.astype(_I64)
    m = base_mult.astype(_I64)

    c = jnp.where(boss_id == FLINT, c // 2, c)
    m = jnp.where(boss_id == FLINT, m // 2, m)
    c = jnp.where(boss_id == OXIDE, 0, c)
    c = jnp.where(boss_id == ARM, jnp.trunc(c.astype(f) * 0.75).astype(_I64), c)
    m = jnp.where(boss_id == ARM, jnp.trunc(m.astype(f) * 0.75).astype(_I64), m)

    plant = jnp.sum(sel & (ranks >= 11) & (ranks <= 13))
    violet = jnp.sum(sel)
    pillar = jnp.sum(sel & played_before)
    n_debuff = jnp.where(boss_id == PLANT, plant,
                         jnp.where(boss_id == VIOLET, violet,
                                   jnp.where(boss_id == PILLAR, pillar, 0)))
    # table dot, not lax.pow — TPU pow(0.8, n) is approximate and flips
    # trunc() integers across backends (core/pow_tables.py docstring)
    pen = PT.pow08(n_debuff, f)
    c = jnp.where(n_debuff > 0, jnp.trunc(c.astype(f) * pen).astype(_I64), c)
    m = jnp.where(n_debuff > 0, jnp.trunc(m.astype(f) * pen).astype(_I64), m)

    ok = active & (base_chips > 0) & (base_mult > 0)
    ratio = (c.astype(f) / jnp.maximum(1, base_chips).astype(f)) * \
            (m.astype(f) / jnp.maximum(1, base_mult).astype(f))
    return jnp.where(ok, ratio, 1.0)
