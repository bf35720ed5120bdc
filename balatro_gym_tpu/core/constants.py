"""Game constants: phases, flat action space, hand types, blind tables.

Mirrors balatro_gym/constants.py (Phase/Action enums, action counts),
balatro_gym/scoring_engine.py:12-56 (HandType + base values + planet map) and
balatro_gym/balatro_env_2.py:55-74 (blind chip table) — rebuilt as integer
constants plus dense jnp tables so every lookup is a gather, never a dict.
"""
from __future__ import annotations

from enum import IntEnum, unique

import jax
import jax.numpy as jnp
import numpy as np

_I64 = jax.dtypes.canonicalize_dtype(jnp.int64)  # i64 under x64, i32 in production (no dtype warnings)

# ---------------------------------------------------------------------------
# Phases (constants.py:34-39)
# ---------------------------------------------------------------------------


@unique
class Phase(IntEnum):
    PLAY = 0
    SHOP = 1
    BLIND_SELECT = 2
    PACK_OPEN = 3


# ---------------------------------------------------------------------------
# Flat Discrete(60) action space (constants.py:43-117)
# ---------------------------------------------------------------------------


class Action:
    PLAY_HAND = 0
    DISCARD = 1
    SELECT_CARD_BASE = 2          # 2-9
    USE_CONSUMABLE_BASE = 10      # 10-14
    SHOP_BUY_BASE = 20            # 20-29
    SHOP_REROLL = 30
    SHOP_END = 31
    SELL_JOKER_BASE = 32          # 32-36
    SELL_CONSUMABLE_BASE = 37     # 37-41
    SELECT_BLIND_BASE = 45        # 45-47
    SKIP_BLIND = 48
    SELECT_FROM_PACK_BASE = 50    # 50-54
    SKIP_PACK = 55

    SELECT_CARD_COUNT = 8
    USE_CONSUMABLE_COUNT = 5
    SHOP_BUY_COUNT = 10
    SELL_JOKER_COUNT = 5
    SELL_CONSUMABLE_COUNT = 5
    SELECT_BLIND_COUNT = 3
    SELECT_FROM_PACK_COUNT = 5
    ACTION_SPACE_SIZE = 60


# ---------------------------------------------------------------------------
# Hand types (scoring_engine.py:12-24)
# ---------------------------------------------------------------------------


@unique
class HandType(IntEnum):
    HIGH_CARD = 0
    ONE_PAIR = 1
    TWO_PAIR = 2
    THREE_KIND = 3
    STRAIGHT = 4
    FLUSH = 5
    FULL_HOUSE = 6
    FOUR_KIND = 7
    STRAIGHT_FLUSH = 8
    FIVE_KIND = 9
    FLUSH_HOUSE = 10
    FLUSH_FIVE = 11


NUM_HAND_TYPES = 12

# Base (chips, mult) per hand type (scoring_engine.py:27-40).
BASE_HAND_CHIPS = jnp.asarray(
    np.array([5, 10, 20, 30, 30, 35, 40, 60, 100, 120, 140, 160], dtype=np.int32)
)
BASE_HAND_MULT = jnp.asarray(
    np.array([1, 2, 2, 3, 4, 4, 4, 7, 8, 12, 14, 16], dtype=np.int32)
)

# Level bonus: level L adds (L-1)*10 chips and (L-1) mult (scoring_engine.py:92-101).
LEVEL_CHIP_STEP = 10
LEVEL_MULT_STEP = 1
MAX_HAND_LEVEL = 15

# Human-readable names, *env path* — hand_type.name.replace('_',' ').title()
# (balatro_env_2.py:674). These are what joker hand-type conditions see in the
# flagship env.
ENV_HAND_NAMES = (
    "High Card", "One Pair", "Two Pair", "Three Kind", "Straight", "Flush",
    "Full House", "Four Kind", "Straight Flush", "Five Kind", "Flush House",
    "Flush Five",
)

# Human-readable names, *sim path* — evaluate_hand keys (balatro_sim.py:222-235).
SIM_HAND_NAMES = (
    "High Card", "Pair", "Two Pair", "Three of a Kind", "Straight", "Flush",
    "Full House", "Four of a Kind", "Straight Flush", "Five of a Kind",
    "Flush House", "Flush Five",
)

# Planet -> hand type (scoring_engine.py:43-56); index = planet id 0..11.
PLANET_NAMES = (
    "Mercury", "Venus", "Earth", "Mars", "Jupiter", "Saturn", "Uranus",
    "Neptune", "Pluto", "Planet X", "Ceres", "Eris",
)
PLANET_HAND = jnp.asarray(
    np.array(
        [
            HandType.ONE_PAIR, HandType.TWO_PAIR, HandType.THREE_KIND,
            HandType.STRAIGHT, HandType.FLUSH, HandType.FULL_HOUSE,
            HandType.FOUR_KIND, HandType.STRAIGHT_FLUSH, HandType.HIGH_CARD,
            HandType.FIVE_KIND, HandType.FLUSH_HOUSE, HandType.FLUSH_FIVE,
        ],
        dtype=np.int32,
    )
)

# ---------------------------------------------------------------------------
# Blind chip requirements (balatro_env_2.py:55-74)
# ---------------------------------------------------------------------------

_blind_chips = np.array(
    [
        [300, 450, 600],
        [450, 675, 900],
        [600, 900, 1200],
        [900, 1350, 1800],
        [1350, 2025, 2700],
        [2100, 3150, 4200],
        [3300, 4950, 6600],
        [5250, 7875, 10500],
    ],
    dtype=np.int64,
)
BLIND_CHIPS_TABLE = jnp.asarray(_blind_chips)  # [8 antes, {small,big,boss}]


def get_blind_chips(ante, blind_idx):
    """Blind chip requirement; traced-friendly. blind_idx 0=small 1=big 2=boss.

    Ante 1-8 from the table, ×1.5^(ante-8) beyond (balatro_env_2.py:66-74).
    """
    ante = jnp.asarray(ante)
    base_ante = jnp.clip(ante, 1, 8)
    base = BLIND_CHIPS_TABLE[base_ante - 1, blind_idx]
    extra = jnp.maximum(ante - 8, 0)
    # table dot, not lax.pow (backend-exact: core/pow_tables.py docstring)
    from balatro_gym_tpu.core import pow_tables as PT
    _f = jax.dtypes.canonicalize_dtype(jnp.float64)
    return (base.astype(_f)
            * PT.pow15(extra, _f)).astype(_I64)


def get_blind_chips_py(ante: int, blind_idx: int) -> int:
    """Python-int version for host-side code paths."""
    if ante <= 8:
        return int(_blind_chips[ante - 1, blind_idx])
    return int(_blind_chips[7, blind_idx] * (1.5 ** (ante - 8)))


# Sim-path blind targets (balatro_sim.py:690-698): base*1.5^(ante-1).
SIM_BLIND_BASE = jnp.asarray(np.array([100, 200, 350], dtype=np.int32))

# Episode caps (balatro_env_2.py:619-623).
MAX_ANTE = 100
MAX_SCORE = 1_000_000_000
