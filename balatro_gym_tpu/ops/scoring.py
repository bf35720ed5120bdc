"""Scoring pipelines as pure jitted arithmetic.

Two order-sensitive pipelines exist in the reference (SURVEY §2.2) and both
are observable behaviour:

* :func:`score_sim` — ``BalatroSimulator.calculate_score``
  (balatro_gym/balatro_sim.py:402-548). This is the pipeline behind the
  recorded parity fixture ``balatro_trajectories.json``. Card enhancements /
  editions / seals are applied *before* jokers; final score is
  ``int(chips_total * ((base_mult + add_mult) * mult_mult))``.

* :func:`score_env_unified` — ``UnifiedScorer.score_hand``
  (balatro_gym/unified_scoring.py:111-299), used by the flagship env. Its
  step-7 enhancement/edition block compares IntEnum values against strings
  and therefore never fires (unified_scoring.py:253-278); enhancements and
  editions contribute ONLY chips, through ``chip_value()``
  (balatro_env_2.py:288-325). Joker money from scoring is written into a
  throwaway dict copy of the state (balatro_env_2.py:688 to_dict) and is
  lost. Both quirks are reproduced — they are part of the observable env.

All truncation points (`int(...)`) are replicated with trunc on f64 (tests
run with x64 enabled; on-TPU f32 is used for throughput where bit parity is
not asserted).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.core import cards as C
from balatro_gym_tpu.core.constants import BASE_HAND_CHIPS, BASE_HAND_MULT
from balatro_gym_tpu.ops import joker_tables as JT
from balatro_gym_tpu.ops.hand_eval import evaluate_sim, classify_env

_F = jnp.float64  # canonicalises to f32 when x64 is disabled

# Sim-path enhancement x-mult: glass x2, steel x1.5 when SCORED
# (balatro_sim.py:463-468).
SIM_ENH_XMULT = jnp.asarray(
    np.array([1, 1, 1, 1, 2, 1.5, 1, 1, 1], dtype=np.float64)
)

MAX_JOKERS = 5


def _joker_flags(jokers):
    four_fingers = jnp.any(jokers == JT.J_FOUR_FINGERS)
    shortcut = jnp.any(jokers == JT.J_SHORTCUT)
    return four_fingers, shortcut


def _suit_onehot(suits, mask, num_cats=5):
    """[num_cats] bool: which suit categories appear among masked cards."""
    oh = (suits[:, None] == jnp.arange(num_cats)) & mask[:, None]
    return jnp.any(oh, axis=0)


def _joker_pass(t: JT.JokerTables, jokers, ranks, suits, smask, valid, ht,
                hand_table_chips, hand_table_mult, hand_table_x,
                hands_left, discards_left, deck_size, key):
    """Shared joker effect computation (individual + main scoring phases).

    ``suits`` are suit categories 0..4 (4 = Stone in the env view). Returns
    (chips_add i64, mult_add i64, x_mult f, money i32, key consumption is
    internal via the passed key).
    """
    jvalid = jokers > 0
    njok = jnp.sum(jvalid).astype(jnp.int32)
    A = jnp.asarray  # numpy tables -> trace constants

    # ---- individual scoring: [J, C] gathers, masked reduce ----
    jr = A(t.ind_chip_rank)[jokers][:, ranks]        # [J, C]
    jm = A(t.ind_mult_rank)[jokers][:, ranks]
    jxr = A(t.ind_x_rank)[jokers][:, ranks]
    jcs = A(t.ind_chip_suit)[jokers][:, suits]
    jms = A(t.ind_mult_suit)[jokers][:, suits]
    jmoney = A(t.ind_money_suit)[jokers][:, suits]
    m2 = (jvalid[:, None] & smask[None, :])
    chips = jnp.sum(jnp.where(m2, jr + jcs, 0)).astype(jnp.int64)
    mult = jnp.sum(jnp.where(m2, jm + jms, 0)).astype(jnp.int64)
    x = jnp.prod(jnp.where(m2, jxr, 1.0).astype(_F))
    money = jnp.sum(jnp.where(m2, jmoney, 0)).astype(jnp.int32)

    # Bloodstone: 50% x2 per scoring Heart per Bloodstone joker
    # (complete_joker_effects.py:161).
    kb, km = jax.random.split(key)
    blood = A(t.is_bloodstone)[jokers][:, None] & m2 & (suits == 2)[None, :]
    coin = jax.random.uniform(kb, blood.shape) < 0.5
    x = x * jnp.prod(jnp.where(blood & coin, 2.0, 1.0).astype(_F))

    # ---- main scoring ----
    jid = jokers
    n_scoring = jnp.sum(smask).astype(jnp.int32)
    chips_main = (
        A(t.chips_flat)[jid]
        + A(hand_table_chips)[jid, ht]
        + jnp.where(A(t.is_banner)[jid], 30 * discards_left, 0)
        + jnp.where(A(t.is_blue)[jid], 2 * deck_size, 0)
    )
    # Misprint: +randint(0,23) mult (complete_joker_effects.py:42); the
    # reference draws from the unseeded global `random`, so only same-seed
    # self-determinism is reproducible — we draw from the joker_effects key.
    misprint = jax.random.randint(km, (MAX_JOKERS,), 0, 24)
    scoring_suits = _suit_onehot(suits, smask & valid)
    suit_mult = jnp.sum(A(t.mult_if_suit)[jid] * scoring_suits[None, :], axis=1)
    nqueens = jnp.sum(valid & (ranks == 12)).astype(jnp.int32)
    nkings = jnp.sum(valid & (ranks == 13)).astype(jnp.int32)
    mult_main = (
        A(t.mult_flat)[jid]
        + A(hand_table_mult)[jid, ht]
        + jnp.where(A(t.is_abstract)[jid], 3 * njok, 0)
        + jnp.where(A(t.is_mystic)[jid] & (discards_left == 0), 15, 0)
        + jnp.where(A(t.is_half)[jid] & (n_scoring <= 3), 20, 0)
        + jnp.where(A(t.is_misprint)[jid], misprint, 0)
        + suit_mult
        + jnp.where(A(t.is_shoot_moon)[jid] & (nqueens > 0), 13 * nqueens, 0)
    )
    # x-mult conditions
    all_spade_club = jnp.all(~valid | (suits == 3) | (suits == 0))
    seeing = scoring_suits[0] & (jnp.sum(scoring_suits) > 1)
    # Flower Pot: exactly 4 distinct suit *strings* among scoring cards — the
    # reference's set includes 'Stone' as its own member (bug-faithful).
    flower = jnp.sum(scoring_suits) == 4
    x_main = (
        A(t.x_flat)[jid].astype(_F)
        * A(hand_table_x)[jid, ht].astype(_F)
        * jnp.where(A(t.is_acrobat)[jid] & (hands_left == 1), 3.0, 1.0)
        * jnp.where(A(t.is_blackboard)[jid] & all_spade_club, 3.0, 1.0)
        * jnp.where(A(t.is_seeing_double)[jid] & seeing, 2.0, 1.0)
        * jnp.where(A(t.is_flower_pot)[jid] & flower, 3.0, 1.0)
        * jnp.where(A(t.is_baron)[jid] & (nkings > 0), 1.5 ** nkings.astype(_F), 1.0)
    )
    chips += jnp.sum(jnp.where(jvalid, chips_main, 0)).astype(jnp.int64)
    mult += jnp.sum(jnp.where(jvalid, mult_main, 0)).astype(jnp.int64)
    x = x * jnp.prod(jnp.where(jvalid, x_main, 1.0))
    return chips, mult, x, money


def score_sim(ranks, suits, valid, enh, ed, seal, base_value, jokers,
              hands_left, discards_left, deck_size, key,
              tables: JT.JokerTables | None = None):
    """``BalatroSimulator.calculate_score`` as a pure function.

    Args:
        ranks/suits/valid: [N] played cards (canonical suits 0..3).
        enh/ed/seal: [N] modifier channels (core.cards enums).
        base_value: [N] card chip values (fixture cards use A=11,
            balatro_sim_test.py:16-24).
        jokers: [5] joker ids (0 = empty).
        key: PRNG key for the stochastic effects (lucky money, Bloodstone,
            Misprint).

    Returns (score i64, money_delta i32, hand_type i32, scoring_mask [N]).
    """
    t = tables or JT.get_tables()
    ff, sc = _joker_flags(jokers)
    ht, smask = evaluate_sim(ranks, suits, valid, ff, sc)
    smask = smask & valid

    chips = BASE_HAND_CHIPS[ht].astype(jnp.int64)
    mult = BASE_HAND_MULT[ht].astype(jnp.int64)
    chips += jnp.sum(jnp.where(smask, base_value, 0)).astype(jnp.int64)

    # Card enhancements / editions / seals, sim semantics
    # (balatro_sim.py:455-488): applied BEFORE jokers.
    chips += jnp.sum(jnp.where(smask, C.ENH_CHIPS[enh] + C.ED_CHIPS[ed], 0)).astype(jnp.int64)
    add = jnp.sum(jnp.where(smask, C.ENH_MULT[enh] + C.ED_MULT[ed], 0)).astype(jnp.int64)
    x = jnp.prod(jnp.where(smask, SIM_ENH_XMULT[enh] * C.ED_XMULT[ed].astype(_F), 1.0))
    money = jnp.sum(
        jnp.where(smask, jnp.where(enh == C.Enhancement.GOLD, 3, 0)
                  + jnp.where(seal == C.Seal.GOLD, 3, 0), 0)
    ).astype(jnp.int32)
    # Lucky: +$1 at 20% per scoring lucky card (balatro_sim.py:473-474).
    k_lucky, k_jok = jax.random.split(key)
    lucky_roll = jax.random.uniform(k_lucky, valid.shape) < 0.2
    money += jnp.sum(jnp.where(smask & (enh == C.Enhancement.LUCKY) & lucky_roll, 1, 0)).astype(jnp.int32)

    jc, jm, jx, jmoney = _joker_pass(
        t, jokers, ranks, suits, smask, valid, ht,
        t.chips_hand_sim, t.mult_hand_sim, t.x_hand_sim,
        hands_left, discards_left, deck_size, k_jok,
    )
    chips += jc
    add += jm
    x = x * jx
    money += jmoney

    # final = int(chips * ((base_mult + add) * mult_mult)) (balatro_sim.py:543-544)
    final_mult = (mult + add).astype(_F) * x
    score = jnp.trunc(chips.astype(_F) * final_mult).astype(jnp.int64)
    return score, money, ht, smask


def score_env_unified(ranks, suits, valid, enh, ed, levels, jokers,
                      hands_left, discards_left, deck_size, key,
                      tables: JT.JokerTables | None = None):
    """``UnifiedScorer.score_hand`` for the flagship env path.

    scoring_cards == ALL selected cards (balatro_env_2.py:683-689). The hand
    is classified from the ORIGINAL ranks/suits (stone does not affect
    classification, balatro_env_2.py:669-671); joker per-card effects see the
    scoring view (stone -> rank 0, suit category 4).

    Returns (base_score i64, hand_type i32).
    """
    t = tables or JT.get_tables()
    ht = classify_env(ranks, suits, valid)
    smask = valid  # every selected card scores

    level = levels[ht].astype(jnp.int64)
    chips = BASE_HAND_CHIPS[ht].astype(jnp.int64) + (level - 1) * 10
    mult = BASE_HAND_MULT[ht].astype(jnp.int64) + (level - 1)

    # chip_value(): rank chips + enhancement chips + edition chips
    # (cards.py:262-267). The ONLY card-modifier contribution in this path.
    chips += jnp.sum(
        jnp.where(smask, C.RANK_CHIPS[ranks] + C.ENH_CHIPS[enh] + C.ED_CHIPS[ed], 0)
    ).astype(jnp.int64)

    # Scoring view for joker per-card conditions (stone: rank 0, suit cat 4).
    stone = enh == C.Enhancement.STONE
    view_ranks = jnp.where(stone, 0, ranks)
    view_suits = jnp.where(stone, JT.STONE_SUIT, suits).astype(jnp.int32)

    jc, jm, jx, _jmoney = _joker_pass(
        t, jokers, view_ranks, view_suits, smask, valid, ht,
        t.chips_hand_env, t.mult_hand_env, t.x_hand_env,
        hands_left, discards_left, deck_size, key,
    )
    # Joker money is discarded in this path (written to a throwaway dict,
    # balatro_env_2.py:688).
    chips += jc
    mult += jm
    score = jnp.trunc(chips.astype(_F) * mult.astype(_F) * jx).astype(jnp.int64)
    return score, ht
