"""Joker effects as dense data tables.

The reference routes ~45 behavioural jokers through dict/if chains per phase
(balatro_gym/complete_joker_effects.py). Here every effect becomes a gather
into a dense table indexed by joker id (1..150, row 0 = empty slot), so the
whole joker pass is a handful of vectorised gathers + masked reductions —
branch-free under jit/vmap.

Table semantics mirror complete_joker_effects.py exactly, including its
bug-faithful quirks:

* Hand-type conditions compare against *strings*, and the env path produces
  different strings ("One Pair", "Three Kind", "Four Kind") than the sim path
  ("Pair", "Three of a Kind", "Four of a Kind") — so e.g. Jolly Joker and
  The Family never fire in the flagship env but do in the simulator
  (complete_joker_effects.py:64-96 vs balatro_env_2.py:674 /
  balatro_sim.py:409). We bake two hand-match tables, one per path.
* Green Joker / Ride the Bus mutate internal counters but NO scoring entry
  reads them (complete_joker_effects.py:211-235 has no matching
  _scoring_effects row), so they are score-neutral; we still track the
  counters in env state for checkpoint parity.
* 8 Ball returns only a message (no chips/mult), so it has no table row.

Suit columns use the canonical suit order (C=0,D=1,H=2,S=3) plus category 4
for Stone cards ("suit" string 'Stone' in the reference's scoring view,
balatro_env_2.py:304-309).

Joker ids reference balatro_gym/jokers.py:11-162.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.core.constants import HandType

NUM_JOKERS = 151  # ids 1..150; 0 = empty slot

# Named ids (jokers.py)
J_JOKER = 1
J_GREEDY, J_LUSTY, J_WRATHFUL, J_GLUTTONOUS = 2, 3, 4, 5
J_JOLLY, J_ZANY, J_MAD, J_CRAZY, J_DROLL = 6, 7, 8, 9, 10
J_SLY, J_WILY, J_CLEVER, J_DEVIOUS, J_CRAFTY = 11, 12, 13, 14, 15
J_HALF = 16
J_FOUR_FINGERS = 18
J_BANNER = 22
J_MYSTIC_SUMMIT = 23
J_8BALL = 26
J_MISPRINT = 27
J_FIBONACCI = 31
J_SCARY_FACE = 33
J_ABSTRACT = 34
J_GROS_MICHEL = 38
J_EVEN_STEVEN = 39
J_ODD_TODD = 40
J_SCHOLAR = 41
J_RIDE_THE_BUS = 44
J_EGG = 46
J_BLACKBOARD = 48
J_ICE_CREAM = 50
J_BLUE_JOKER = 53
J_FACELESS = 57
J_GREEN_JOKER = 58
J_CAVENDISH = 61
J_SHORTCUT = 69
J_BARON = 72
J_LUCHADOR = 77
J_GIFT_CARD = 79
J_TRADING_CARD = 95
J_POPCORN = 97
J_WALKIE_TALKIE = 101
J_SMILEY_FACE = 104
J_ACROBAT = 108
J_SWASHBUCKLER = 110
J_ROUGH_GEM = 116
J_BLOODSTONE = 117
J_ARROWHEAD = 118
J_ONYX_AGATE = 119
J_FLOWER_POT = 122
J_WEE_JOKER = 124
J_SEEING_DOUBLE = 128
J_THE_DUO = 131
J_THE_TRIO = 132
J_THE_FAMILY = 133
J_THE_ORDER = 134
J_THE_TRIBE = 135
J_STUNTMAN = 136
J_SHOOT_THE_MOON = 140
J_TRIBOULET = 147

# Canonical suits
_C, _D, _H, _S = 0, 1, 2, 3
STONE_SUIT = 4  # scoring-view category for Stone cards
NUM_SUIT_CATS = 5

# ---------------------------------------------------------------------------
# Individual-scoring tables (complete_joker_effects.py:131-184)
# ---------------------------------------------------------------------------

_ind_chip_rank = np.zeros((NUM_JOKERS, 15), np.int32)
_ind_mult_rank = np.zeros((NUM_JOKERS, 15), np.int32)
_ind_x_rank = np.ones((NUM_JOKERS, 15), np.float32)
_ind_chip_suit = np.zeros((NUM_JOKERS, NUM_SUIT_CATS), np.int32)
_ind_mult_suit = np.zeros((NUM_JOKERS, NUM_SUIT_CATS), np.int32)
_ind_money_suit = np.zeros((NUM_JOKERS, NUM_SUIT_CATS), np.int32)

for r in (2, 3, 5, 8, 14):
    _ind_mult_rank[J_FIBONACCI, r] = 8
for r in (2, 4, 6, 8, 10):
    _ind_mult_rank[J_EVEN_STEVEN, r] = 4
for r in (3, 5, 7, 9, 14):
    _ind_chip_rank[J_ODD_TODD, r] = 31
_ind_chip_rank[J_SCHOLAR, 14] = 20
_ind_mult_rank[J_SCHOLAR, 14] = 4
for r in (4, 10):
    _ind_chip_rank[J_WALKIE_TALKIE, r] = 10
    _ind_mult_rank[J_WALKIE_TALKIE, r] = 4
_ind_chip_rank[J_WEE_JOKER, 2] = 8
for r in (11, 12, 13):  # face cards
    _ind_chip_rank[J_SCARY_FACE, r] = 30
    _ind_mult_rank[J_SMILEY_FACE, r] = 5
for r in (12, 13):  # Queens & Kings
    _ind_x_rank[J_TRIBOULET, r] = 2.0
_ind_chip_suit[J_ARROWHEAD, _S] = 50
_ind_mult_suit[J_ONYX_AGATE, _C] = 7
_ind_money_suit[J_ROUGH_GEM, _D] = 1
# Bloodstone (hearts, 50% x2) is stochastic -> flag column below.

# ---------------------------------------------------------------------------
# Main-scoring tables (complete_joker_effects.py:35-128)
# ---------------------------------------------------------------------------

_chips_flat = np.zeros(NUM_JOKERS, np.int32)
_mult_flat = np.zeros(NUM_JOKERS, np.int32)
_x_flat = np.ones(NUM_JOKERS, np.float32)

_mult_flat[J_JOKER] = 4
_chips_flat[J_STUNTMAN] = 250
_mult_flat[J_GROS_MICHEL] = 15
_x_flat[J_CAVENDISH] = 3.0
_mult_flat[J_POPCORN] = 20
_chips_flat[J_ICE_CREAM] = 100

# "+3 mult if any scoring card has suit" (complete_joker_effects.py:56-61).
_mult_if_suit = np.zeros((NUM_JOKERS, NUM_SUIT_CATS), np.int32)
_mult_if_suit[J_GREEDY, _D] = 3
_mult_if_suit[J_LUSTY, _H] = 3
_mult_if_suit[J_WRATHFUL, _S] = 3
_mult_if_suit[J_GLUTTONOUS, _C] = 3

# Hand-type-conditioned tables, per path (string-compare bug baked in).
_HAND_JOKERS = {
    # joker: (reference condition string, chips, mult, x)
    J_JOLLY: ("Pair", 0, 8, 1.0),
    J_ZANY: ("Three of a Kind", 0, 12, 1.0),
    J_MAD: ("Two Pair", 0, 10, 1.0),
    J_CRAZY: ("Straight", 0, 12, 1.0),
    J_DROLL: ("Flush", 0, 10, 1.0),
    J_SLY: ("Pair", 50, 0, 1.0),
    J_WILY: ("Three of a Kind", 100, 0, 1.0),
    J_CLEVER: ("Two Pair", 80, 0, 1.0),
    J_DEVIOUS: ("Straight", 100, 0, 1.0),
    J_CRAFTY: ("Flush", 80, 0, 1.0),
    J_THE_DUO: ("Pair", 0, 0, 2.0),
    J_THE_TRIO: ("Three of a Kind", 0, 0, 3.0),
    J_THE_FAMILY: ("Four of a Kind", 0, 0, 4.0),
    J_THE_ORDER: ("Straight", 0, 0, 3.0),
    J_THE_TRIBE: ("Flush", 0, 0, 2.0),
}

from balatro_gym_tpu.core.constants import SIM_HAND_NAMES  # noqa: E402


def _hand_tables(names):
    chips = np.zeros((NUM_JOKERS, 12), np.int32)
    mult = np.zeros((NUM_JOKERS, 12), np.int32)
    x = np.ones((NUM_JOKERS, 12), np.float32)
    for j, (cond, c, m, xv) in _HAND_JOKERS.items():
        for ht, name in enumerate(names):
            if name == cond:
                chips[j, ht] = c
                mult[j, ht] = m
                x[j, ht] = xv
    return chips, mult, x


# SIM path only: the flagship env path applies NO joker effects at all
# (PARITY #A38 — UnifiedScorer's isinstance(joker_name, str) guards fail on
# to_dict()'s {'name','id'} dicts, unified_scoring.py:164-221 /
# balatro_env_2.py:219), so no env-string hand tables exist. The env path's
# ENV_HAND_NAMES strings (constants.py) remain documented for the ledger.
_chips_hand_sim, _mult_hand_sim, _x_hand_sim = _hand_tables(SIM_HAND_NAMES)


def _xmult_exponents(x):
    """Decompose x-mult tables with values in {1,2,3,4} into integer
    exponents of the exact bases 2 and 3 (4 = 2²), so products become
    ``2**e2 * 3**e3`` — bit-exact floats, no gathers, no logs."""
    e2 = np.zeros(x.shape, np.int32)
    e3 = np.zeros(x.shape, np.int32)
    e2[x == 2.0] = 1
    e2[x == 4.0] = 2
    e3[x == 3.0] = 1
    assert np.all(np.isin(x, (1.0, 2.0, 3.0, 4.0))), "unsupported x-mult base"
    return e2, e3


_x2_hand_sim, _x3_hand_sim = _xmult_exponents(_x_hand_sim)
_x3_flat = np.zeros(NUM_JOKERS, np.int32)
_x3_flat[J_CAVENDISH] = 1  # x_flat's only non-1 entry (3.0)

# Flag columns for conditional / stochastic jokers.
def _flag(*ids):
    f = np.zeros(NUM_JOKERS, bool)
    for i in ids:
        f[i] = True
    return f


_IS_HALF = _flag(J_HALF)                 # +20 mult if <=3 scoring cards
_IS_ABSTRACT = _flag(J_ABSTRACT)         # +3 mult per joker held
_IS_ACROBAT = _flag(J_ACROBAT)           # x3 if hands_left == 1
_IS_MYSTIC = _flag(J_MYSTIC_SUMMIT)      # +15 mult if discards_left == 0
_IS_BANNER = _flag(J_BANNER)             # +30 chips per discard left
_IS_BLUE = _flag(J_BLUE_JOKER)           # +2 chips per deck card
_IS_MISPRINT = _flag(J_MISPRINT)         # +randint(0,23) mult
_IS_BLACKBOARD = _flag(J_BLACKBOARD)     # x3 if all played cards ♠/♣
_IS_SEEING_DOUBLE = _flag(J_SEEING_DOUBLE)  # x2 if ♣ + another suit scoring
_IS_FLOWER_POT = _flag(J_FLOWER_POT)     # x3 if exactly 4 scoring suit cats
_IS_BARON = _flag(J_BARON)               # x1.5 per King among played cards
_IS_SHOOT_MOON = _flag(J_SHOOT_THE_MOON)  # +13 mult per Queen among played
_IS_BLOODSTONE = _flag(J_BLOODSTONE)     # 50%: x2 per scoring ♥ card
_IS_TRADING = _flag(J_TRADING_CARD)      # discard: $3 if first discard of 1
_IS_FACELESS = _flag(J_FACELESS)         # discard: $5 if >=3 face discards


class JokerTables:
    """Dense tables held as numpy constants.

    Kept as numpy (not jnp) on purpose: numpy arrays are embedded as
    trace-time constants, so the singleton can be created lazily even inside
    a jit trace without leaking tracers, and XLA de-duplicates them across
    programs.
    """

    def __init__(self):
        as_j = np.asarray
        self.ind_chip_rank = as_j(_ind_chip_rank)
        self.ind_mult_rank = as_j(_ind_mult_rank)
        self.ind_x_rank = as_j(_ind_x_rank)
        self.ind_chip_suit = as_j(_ind_chip_suit)
        self.ind_mult_suit = as_j(_ind_mult_suit)
        self.ind_money_suit = as_j(_ind_money_suit)
        self.chips_flat = as_j(_chips_flat)
        self.mult_flat = as_j(_mult_flat)
        self.x_flat = as_j(_x_flat)
        self.mult_if_suit = as_j(_mult_if_suit)
        self.chips_hand_sim = as_j(_chips_hand_sim)
        self.mult_hand_sim = as_j(_mult_hand_sim)
        self.x_hand_sim = as_j(_x_hand_sim)
        self.x2_hand_sim = as_j(_x2_hand_sim)
        self.x3_hand_sim = as_j(_x3_hand_sim)
        self.x3_flat = as_j(_x3_flat)
        self.is_half = as_j(_IS_HALF)
        self.is_abstract = as_j(_IS_ABSTRACT)
        self.is_acrobat = as_j(_IS_ACROBAT)
        self.is_mystic = as_j(_IS_MYSTIC)
        self.is_banner = as_j(_IS_BANNER)
        self.is_blue = as_j(_IS_BLUE)
        self.is_misprint = as_j(_IS_MISPRINT)
        self.is_blackboard = as_j(_IS_BLACKBOARD)
        self.is_seeing_double = as_j(_IS_SEEING_DOUBLE)
        self.is_flower_pot = as_j(_IS_FLOWER_POT)
        self.is_baron = as_j(_IS_BARON)
        self.is_shoot_moon = as_j(_IS_SHOOT_MOON)
        self.is_bloodstone = as_j(_IS_BLOODSTONE)
        self.is_trading = as_j(_IS_TRADING)
        self.is_faceless = as_j(_IS_FACELESS)


_TABLES = None


def get_tables() -> JokerTables:
    global _TABLES
    if _TABLES is None:
        _TABLES = JokerTables()
    return _TABLES


# Shop metadata: base cost per joker id (jokers.py). 0 => legendary,
# shop-ineligible (shop.py:124).
_base_cost = np.zeros(NUM_JOKERS, np.int32)
_JOKER_COSTS = {
    1: 2, 2: 5, 3: 5, 4: 5, 5: 5, 6: 3, 7: 4, 8: 4, 9: 4, 10: 4, 11: 3,
    12: 4, 13: 4, 14: 4, 15: 4, 16: 5, 17: 8, 18: 7, 19: 5, 20: 1, 21: 6,
    22: 5, 23: 5, 24: 6, 25: 5, 26: 5, 27: 4, 28: 5, 29: 5, 30: 4, 31: 8,
    32: 7, 33: 4, 34: 4, 35: 4, 36: 6, 37: 5, 38: 5, 39: 4, 40: 4, 41: 4,
    42: 4, 43: 5, 44: 6, 45: 5, 46: 4, 47: 6, 48: 6, 49: 5, 50: 5, 51: 8,
    52: 3, 53: 5, 54: 6, 55: 6, 56: 5, 57: 4, 58: 4, 59: 4, 60: 4, 61: 4,
    62: 6, 63: 5, 64: 7, 65: 4, 66: 6, 67: 6, 68: 7, 69: 7, 70: 7, 71: 8,
    72: 8, 73: 7, 74: 6, 75: 8, 76: 7, 77: 5, 78: 5, 79: 6, 80: 6, 81: 6,
    82: 6, 83: 4, 84: 5, 85: 4, 86: 6, 87: 4, 88: 4, 89: 6, 90: 6, 91: 6,
    92: 8, 93: 6, 94: 6, 95: 6, 96: 5, 97: 5, 98: 6, 99: 8, 100: 6, 101: 4,
    102: 6, 103: 6, 104: 4, 105: 9, 106: 5, 107: 5, 108: 6, 109: 6, 110: 4,
    111: 6, 112: 6, 113: 7, 114: 6, 115: 4, 116: 7, 117: 7, 118: 7, 119: 7,
    120: 6, 121: 5, 122: 6, 123: 10, 124: 8, 125: 7, 126: 4, 127: 6, 128: 6,
    129: 7, 130: 8, 131: 8, 132: 8, 133: 8, 134: 8, 135: 8, 136: 7, 137: 8,
    138: 10, 139: 6, 140: 5, 141: 7, 142: 6, 143: 8, 144: 8, 145: 7,
    146: 0, 147: 0, 148: 0, 149: 0, 150: 0,
}
for _id, _c in _JOKER_COSTS.items():
    _base_cost[_id] = _c
JOKER_BASE_COST = jnp.asarray(_base_cost)
JOKER_BASE_COST_NP = _base_cost
