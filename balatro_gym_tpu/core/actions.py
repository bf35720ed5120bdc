"""312-action codec for the 8-card draw env.

Mirrors balatro_gym/actions.py: discard bitmask 0-255 + C(8,5)=56 select-five
combos at 256-311. The combo table is materialised as a dense [56, 8] boolean
mask so decoding on device is a single gather.
"""
from __future__ import annotations

from itertools import combinations

import jax.numpy as jnp
import numpy as np

NUM_DISCARD_ACTIONS = 256
DISCARD_OFFSET = 0
FIVE_CARD_COMBOS = tuple(combinations(range(8), 5))  # lexicographic, len 56
NUM_SELECT_ACTIONS = len(FIVE_CARD_COMBOS)
SELECT_OFFSET = NUM_DISCARD_ACTIONS
ACTION_SPACE_SIZE = NUM_DISCARD_ACTIONS + NUM_SELECT_ACTIONS  # 312

# [56, 8] keep-mask per select action.
_select_masks = np.zeros((NUM_SELECT_ACTIONS, 8), dtype=bool)
for _i, _combo in enumerate(FIVE_CARD_COMBOS):
    _select_masks[_i, list(_combo)] = True
SELECT_MASKS = jnp.asarray(_select_masks)

# [256, 8] discard-mask per discard action (bit i set => discard card i).
_discard_masks = ((np.arange(256)[:, None] >> np.arange(8)[None, :]) & 1).astype(bool)
DISCARD_MASKS = jnp.asarray(_discard_masks)


def encode_discard(mask: int) -> int:
    return mask


def decode_discard(action_id: int):
    return [i for i in range(8) if (action_id >> i) & 1]


def encode_select(indices) -> int:
    return SELECT_OFFSET + FIVE_CARD_COMBOS.index(tuple(indices))


def decode_select(action_id: int):
    return FIVE_CARD_COMBOS[action_id - SELECT_OFFSET]
