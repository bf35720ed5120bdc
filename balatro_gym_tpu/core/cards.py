"""Card primitives for the TPU-native Balatro engine.

Everything is an integer. Cards never exist as objects on the device: a card is
a (rank, suit) pair of int8s plus per-card modifier channels (enhancement,
edition, seal) stored in parallel arrays of a fixed-shape state pytree.

Canonical integer conventions (documented once, used everywhere):

* ``rank``: 2..14 where 11=J, 12=Q, 13=K, 14=A. 0 is the "no card" sentinel
  (also used for Stone cards in the scoring view, mirroring the reference's
  CardAdapter which gives stone cards rank 0 / suit 'Stone',
  reference: balatro_gym/balatro_env_2.py:304-309).
* ``suit``: CLUBS=0, DIAMONDS=1, HEARTS=2, SPADES=3 — matches the reference's
  primary suit order (balatro_gym/cards.py:14-19). The *sim* path
  (balatro_sim.py:371) uses Spades=0,Hearts=1,Diamonds=2,Clubs=3; we expose an
  explicit permutation for that codec rather than a second enum.

Two 0-51 packings exist in the reference; we implement both as pure codecs:

* ``encode_rs``: (rank-2)*4 + suit — the flagship env observation encoding
  (balatro_gym/cards.py:103, used by balatro_env_2.py:1479).
* ``encode_sim``: sim_suit*13 + (rank-2) with the sim suit order — the
  simulator/consumables encoding (balatro_sim.py:369-372, consumables.py:74).

Static effect tables mirror balatro_gym/cards.py:118-251.
"""
from __future__ import annotations

from enum import IntEnum, unique

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Enums (host-side only; device code uses the raw ints)
# ---------------------------------------------------------------------------


@unique
class Suit(IntEnum):
    CLUBS = 0
    DIAMONDS = 1
    HEARTS = 2
    SPADES = 3


@unique
class Enhancement(IntEnum):
    NONE = 0
    BONUS = 1   # +30 chips
    MULT = 2    # +4 mult
    WILD = 3    # any suit
    GLASS = 4   # x2 mult, 1/4 destroy
    STEEL = 5   # x1.5 mult while held
    STONE = 6   # +50 chips, no rank/suit
    GOLD = 7    # $3 held at end of round
    LUCKY = 8   # 1/5 +20 mult, 1/15 $20


@unique
class Edition(IntEnum):
    NONE = 0
    FOIL = 1          # +50 chips
    HOLOGRAPHIC = 2   # +10 mult
    POLYCHROME = 3    # x1.5 mult
    NEGATIVE = 4      # +1 joker slot


@unique
class Seal(IntEnum):
    NONE = 0
    GOLD = 1    # $3 when played & scored
    RED = 2     # retrigger
    BLUE = 3    # planet on play
    PURPLE = 4  # tarot on discard


NUM_RANKS = 13          # ranks 2..14
NO_CARD = 0             # rank sentinel for empty slots

SUIT_SYMBOLS = "♣♦♥♠"  # ♣ ♦ ♥ ♠ in canonical order
SUIT_NAMES = ("Clubs", "Diamonds", "Hearts", "Spades")
RANK_SHORT = {10: "T", 11: "J", 12: "Q", 13: "K", 14: "A"}

# Sim suit order: Spades=0, Hearts=1, Diamonds=2, Clubs=3 (balatro_sim.py:371).
# CANON_TO_SIM_SUIT[canonical_suit] -> sim suit index.
CANON_TO_SIM_SUIT = np.array([3, 2, 1, 0], dtype=np.int8)
SIM_TO_CANON_SUIT = np.array([3, 2, 1, 0], dtype=np.int8)  # involution

# ---------------------------------------------------------------------------
# Static tables (indexable by rank 0..14 so the sentinel is harmless)
# ---------------------------------------------------------------------------

# Base chip value per rank (cards.py:53-60): 2-10 face value, J/Q/K=10, A=11.
_rank_chips = np.zeros(15, dtype=np.int32)
for _r in range(2, 11):
    _rank_chips[_r] = _r
_rank_chips[11] = _rank_chips[12] = _rank_chips[13] = 10
_rank_chips[14] = 11
RANK_CHIPS = jnp.asarray(_rank_chips)

# Enhancement chip bonus (cards.py:121-128): BONUS=+30, STONE=+50.
ENH_CHIPS = jnp.asarray(np.array([0, 30, 0, 0, 0, 0, 50, 0, 0], dtype=np.int32))
# Enhancement mult bonus (cards.py:130-135): MULT=+4.
ENH_MULT = jnp.asarray(np.array([0, 0, 4, 0, 0, 0, 0, 0, 0], dtype=np.int32))
# Enhancement mult multiplier when scored (cards.py:137-144): GLASS=2.0.
ENH_XMULT = jnp.asarray(np.array([1, 1, 1, 1, 2, 1, 1, 1, 1], dtype=np.float32))
# Steel in-hand multiplier (cards.py:141-143).
STEEL_IN_HAND_XMULT = 1.5

# Edition chip bonus (cards.py:179-184): FOIL=+50.
ED_CHIPS = jnp.asarray(np.array([0, 50, 0, 0, 0], dtype=np.int32))
# Edition mult bonus (cards.py:186-191): HOLO=+10.
ED_MULT = jnp.asarray(np.array([0, 0, 10, 0, 0], dtype=np.int32))
# Edition mult multiplier (cards.py:193-198): POLY=x1.5.
ED_XMULT = jnp.asarray(np.array([1.0, 1.0, 1.0, 1.5, 1.0], dtype=np.float32))

# Seal money when played (cards.py:211-216): GOLD seal $3.
SEAL_MONEY = jnp.asarray(np.array([0, 3, 0, 0, 0], dtype=np.int32))

GOLD_CARD_MONEY = 3        # cards.py:157-161
GLASS_BREAK_P = 0.25       # cards.py:163-166
LUCKY_MULT_P = 0.2         # cards.py:169-173 (+20 mult, 1/5)
LUCKY_MONEY_P = 0.0667     # cards.py:172 ($20, ~1/15)
LUCKY_MULT_BONUS = 20
LUCKY_MONEY_BONUS = 20


# ---------------------------------------------------------------------------
# Codecs (work on numpy or jnp arrays and python ints alike)
# ---------------------------------------------------------------------------

def encode_rs(rank, suit):
    """(rank-2)*4 + suit, canonical suit order. Mirrors cards.py:103."""
    return (rank - 2) * 4 + suit


def decode_rs(code):
    """Inverse of :func:`encode_rs` -> (rank, suit)."""
    return code // 4 + 2, code % 4


def encode_sim(rank, suit):
    """sim_suit*13 + (rank-2). Mirrors balatro_sim.py:369-372.

    ``suit`` is in canonical order and permuted to sim order internally.
    """
    sim_suit = jnp.asarray(CANON_TO_SIM_SUIT)[suit] if hasattr(suit, "shape") else int(CANON_TO_SIM_SUIT[suit])
    return sim_suit * 13 + (rank - 2)


def decode_sim(code):
    """Inverse of :func:`encode_sim` -> (rank, canonical suit)."""
    sim_suit = code // 13
    rank = code % 13 + 2
    suit = jnp.asarray(SIM_TO_CANON_SUIT)[sim_suit] if hasattr(code, "shape") else int(SIM_TO_CANON_SUIT[sim_suit])
    return rank, suit


def card_str(rank: int, suit: int) -> str:
    """Pretty-print, e.g. 'A♠'."""
    if rank == NO_CARD:
        return "--"
    return f"{RANK_SHORT.get(int(rank), str(int(rank)))}{SUIT_SYMBOLS[int(suit)]}"


def standard_deck_arrays():
    """The ordered 52-card deck as (ranks, suits) int8 arrays.

    Order: for suit in (C,D,H,S): for rank in 2..14 — matching the reference
    reset loop `for suit in Suit: for rank in Rank` (balatro_env_2.py:519-522).
    """
    ranks = np.tile(np.arange(2, 15, dtype=np.int8), 4)
    suits = np.repeat(np.arange(4, dtype=np.int8), 13)
    return ranks, suits
