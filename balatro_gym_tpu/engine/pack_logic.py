"""Pack-opening phase: opt-in rebuild of the modular handler's semantics.

Reference: ``envs/phase_handlers/pack_open.py:31-252`` — the rich
pick-from-pack logic that the reference ships but never runs: the flagship
env's ``_step_pack_open`` is phase→SHOP + shop regen ("simplified for
now", balatro_env_2.py:1320-1324), nothing ever sets ``Phase.PACK_OPEN``,
and the modular env that would drive this handler cannot import (six
missing modules, balatro_env_small.py:13-19). The handler itself carries
two latent crashes: ``Action.PACK_SELECT_BASE`` does not exist in
constants.py (pack_open.py:40 — real name ``SELECT_FROM_PACK_BASE``,
constants.py:79) and ``JokerInfo`` has no ``rarity`` attribute
(pack_open.py:243-245 vs jokers.py:5-9). See PARITY.md #B12.

This module rebuilds the handler's DOCUMENTED semantics as pure jittable
state transforms, opt-in (the parity env ``engine/full_env`` keeps the
flagship's trivial mirror):

* pack contents are caller-provided data, exactly as in the reference
  (``open_pack(pack_type, pack_contents)`` receives the list; no generator
  exists anywhere in the reference tree);
* pick counts per pack type: 1, Mega variants 2 (pack_open.py:143-158);
* selecting an item applies it with the reference's reward table
  (pack_open.py:190-251): playing card +3 (+2 enh/+3 edition/+2 seal),
  consumable +8 planet / +5 tarot / +10 spectral or -1 when slots full,
  joker +15 or -1 when slots full (the rarity bonus is unreachable in the
  reference — ``JokerInfo.rarity`` AttributeError — and is omitted);
* duplicate / out-of-range selections return -1 (pack_open.py:78-85);
* SKIP pays -1 x remaining picks and returns to shop (pack_open.py:108-119);
* completing the picks returns to shop (pack_open.py:121-137).

Cards join the deck in the highest free slots (the fixed-shape equivalent
of ``state.deck.append``, matching consumable_logic._create_cards).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from balatro_gym_tpu.core.constants import Action, Phase
from balatro_gym_tpu.engine import consumable_logic as CL

PACK_SIZE = 5

# item_kind channel values
K_CARD = 0
K_CONSUMABLE = 1
K_JOKER = 2

# pick counts (pack_open.py:143-158): index = pack kind, mega flag doubles.
PICKS_BASE = 1
PICKS_MEGA = 2


class PackState(NamedTuple):
    """Contents of one opened pack (fixed 5 slots) + selection progress."""
    item_kind: jnp.ndarray   # [5] i32: K_CARD / K_CONSUMABLE / K_JOKER
    item_id: jnp.ndarray     # [5] i32: card 0-51 / consumable obs id / joker id
    item_enh: jnp.ndarray    # [5] i32 (cards only)
    item_ed: jnp.ndarray     # [5] i32
    item_seal: jnp.ndarray   # [5] i32
    picked: jnp.ndarray      # [5] bool
    picks_left: jnp.ndarray  # i32
    active: jnp.ndarray      # bool


def open_pack(st, item_kind, item_id, item_enh=None, item_ed=None,
              item_seal=None, mega: bool = False):
    """Enter the pack-open phase with caller-provided contents
    (pack_open.py:47-72). Returns (state, PackState)."""
    z5 = jnp.zeros(PACK_SIZE, jnp.int32)
    pack = PackState(
        item_kind=jnp.asarray(item_kind, jnp.int32),
        item_id=jnp.asarray(item_id, jnp.int32),
        item_enh=z5 if item_enh is None else jnp.asarray(item_enh, jnp.int32),
        item_ed=z5 if item_ed is None else jnp.asarray(item_ed, jnp.int32),
        item_seal=z5 if item_seal is None else jnp.asarray(item_seal, jnp.int32),
        picked=jnp.zeros(PACK_SIZE, bool),
        picks_left=jnp.int32(PICKS_MEGA if mega else PICKS_BASE),
        active=jnp.ones((), bool),
    )
    return st.replace(phase=jnp.int32(Phase.PACK_OPEN)), pack


def _apply_card(st, pack, idx):
    """Playing card joins the deck in the highest free slot
    (pack_open.py:195-217; deck.append equivalent)."""
    free = ~st.card_alive
    # highest free slot: argmax over reversed cumulative count
    rev_cum = jnp.cumsum(free[::-1].astype(jnp.int32))[::-1]
    take = free & (rev_cum == 1)
    onehot5 = jnp.arange(PACK_SIZE) == idx
    cid = jnp.sum(jnp.where(onehot5, pack.item_id, 0))
    enh = jnp.sum(jnp.where(onehot5, pack.item_enh, 0))
    ed = jnp.sum(jnp.where(onehot5, pack.item_ed, 0))
    seal = jnp.sum(jnp.where(onehot5, pack.item_seal, 0))
    # card id 0-51 = suit*13 + (rank-2) (core/cards.py canonical encoding)
    rank = cid % 13 + 2
    suit = cid // 13
    any_free = jnp.any(free)
    st2 = st.replace(
        card_rank=jnp.where(take, rank, st.card_rank),
        card_suit=jnp.where(take, suit, st.card_suit),
        card_enh=jnp.where(take, enh, st.card_enh),
        card_ed=jnp.where(take, ed, st.card_ed),
        card_seal=jnp.where(take, seal, st.card_seal),
        card_alive=st.card_alive | take,
    )
    reward = jnp.where(any_free,
                       3.0 + jnp.where(enh > 0, 2.0, 0.0)
                       + jnp.where(ed > 0, 3.0, 0.0)
                       + jnp.where(seal > 0, 2.0, 0.0), -1.0)
    return st2, reward.astype(jnp.float32), any_free


def _apply_consumable(st, pack, idx):
    """Consumable joins the inventory if a slot is free
    (pack_open.py:219-234); reward 8 planet / 5 tarot / 10 spectral."""
    onehot5 = jnp.arange(PACK_SIZE) == idx
    cid = jnp.sum(jnp.where(onehot5, pack.item_id, 0))
    ok = st.cons_n < st.cons_slots
    slots = jnp.arange(st.cons.shape[0])
    st2 = st.replace(
        cons=jnp.where(ok & (slots == st.cons_n), cid, st.cons),
        cons_n=st.cons_n + ok.astype(jnp.int32),
    )
    is_planet = (cid >= CL.PLANET_BASE) & (cid < CL.PLANET_BASE + CL.NUM_PLANET)
    is_tarot = (cid >= CL.TAROT_BASE) & (cid < CL.TAROT_BASE + CL.NUM_TAROT)
    reward = jnp.where(ok, jnp.where(is_planet, 8.0,
                                     jnp.where(is_tarot, 5.0, 10.0)), -1.0)
    return st2, reward.astype(jnp.float32), ok


def _apply_joker(st, pack, idx):
    """Joker joins the collection if a slot is free (pack_open.py:236-249);
    the reference's rarity bonus is unreachable (JokerInfo has no rarity)."""
    onehot5 = jnp.arange(PACK_SIZE) == idx
    jid = jnp.sum(jnp.where(onehot5, pack.item_id, 0))
    ok = st.joker_n < st.joker_slots
    slots = jnp.arange(st.jokers.shape[0])
    st2 = st.replace(
        jokers=jnp.where(ok & (slots == st.joker_n), jid, st.jokers),
        joker_n=st.joker_n + ok.astype(jnp.int32),
    )
    return st2, jnp.where(ok, 15.0, -1.0).astype(jnp.float32), ok


def step_pack(st, pack: PackState, action):
    """One pack-phase action (pack_open.py:31-45). Returns
    (state, PackState, reward)."""
    action = jnp.asarray(action, jnp.int32)
    idx = jnp.clip(action - Action.SELECT_FROM_PACK_BASE, 0, PACK_SIZE - 1)
    in_range = ((action >= Action.SELECT_FROM_PACK_BASE)
                & (action < Action.SELECT_FROM_PACK_BASE + PACK_SIZE))
    is_skip = action == Action.SKIP_PACK

    kind = jnp.sum(jnp.where(jnp.arange(PACK_SIZE) == idx, pack.item_kind, 0))
    already = jnp.sum(jnp.where(jnp.arange(PACK_SIZE) == idx,
                                pack.picked.astype(jnp.int32), 0)) > 0
    can_pick = (in_range & pack.active & ~already & (pack.picks_left > 0))

    st_c, r_c, _ = _apply_card(st, pack, idx)
    st_u, r_u, _ = _apply_consumable(st, pack, idx)
    st_j, r_j, _ = _apply_joker(st, pack, idx)

    def merge(pred, new, old, fields):
        """Field-wise select (never touches the PRNG-key leaf)."""
        upd = {}
        for f in fields:
            a, b = getattr(new, f), getattr(old, f)
            if a.dtype == jnp.bool_:
                upd[f] = (pred & a) | (~pred & b)
            else:
                upd[f] = jnp.where(pred, a, b)
        return old.replace(**upd)

    st2 = merge(can_pick & (kind == K_CARD), st_c, st,
                ("card_rank", "card_suit", "card_enh", "card_ed",
                 "card_seal", "card_alive"))
    st2 = merge(can_pick & (kind == K_CONSUMABLE), st_u, st2,
                ("cons", "cons_n"))
    st2 = merge(can_pick & (kind == K_JOKER), st_j, st2,
                ("jokers", "joker_n"))
    reward = jnp.where(
        can_pick,
        jnp.where(kind == K_CARD, r_c,
                  jnp.where(kind == K_CONSUMABLE, r_u, r_j)),
        jnp.float32(-1.0))

    picked2 = pack.picked | ((jnp.arange(PACK_SIZE) == idx) & can_pick)
    left2 = pack.picks_left - can_pick.astype(jnp.int32)

    # skip: -1 x remaining picks (pack_open.py:108-119)
    reward = jnp.where(is_skip & pack.active,
                       -1.0 * pack.picks_left.astype(jnp.float32), reward)
    close = (is_skip & pack.active) | (can_pick & (left2 <= 0))
    st3 = st2.replace(phase=jnp.where(close, jnp.int32(Phase.SHOP), st2.phase))
    pack3 = pack._replace(picked=picked2, picks_left=left2,
                          active=pack.active & ~close)
    return st3, pack3, reward
