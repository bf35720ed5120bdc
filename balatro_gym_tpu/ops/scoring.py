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
from balatro_gym_tpu.core import pow_tables as P
from balatro_gym_tpu.core.constants import BASE_HAND_CHIPS, BASE_HAND_MULT
from balatro_gym_tpu.ops import joker_tables as JT
from balatro_gym_tpu.ops.hand_eval import evaluate_sim, classify_env

_I64 = jax.dtypes.canonicalize_dtype(jnp.int64)  # i64 under x64, i32 in production (no dtype warnings)

# Resolved once at import (no per-call-site f64 UserWarnings under f32).
_F = jax.dtypes.canonicalize_dtype(jnp.float64)

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


def _joker_chance(key, n_jok, n_cards):
    """The joker pass's stochastic draws: Bloodstone coin matrix
    [n_jok, n_cards] and the Misprint value (f32 scalar, randint 0..23).
    Module-level seam: the reference-differential test monkeypatches this
    to force the live reference env's recorded outcomes; the key splits and
    draw computation are byte-identical to the previous inline form (the
    fused kernels replay these draws via ops/kernel_rng — do not reorder)."""
    kb, km = jax.random.split(key)
    coin = jax.random.uniform(kb, (n_jok, n_cards)) < 0.5
    misprint = jax.random.randint(km, (), 0, 24).astype(jnp.float32)
    return coin, misprint


def _joker_pass(t: JT.JokerTables, jokers, ranks, suits, smask, valid, ht,
                hand_table_chips, hand_table_mult, x2_hand, x3_hand,
                hands_left, discards_left, deck_size, key):
    """Shared joker effect computation (individual + main scoring phases).

    ``suits`` are suit categories 0..4 (4 = Stone in the env view). Returns
    (chips_add i64, mult_add i64, x_mult f, money i32).

    TPU-first formulation: NO data-dependent gathers. The joker hand becomes
    a multi-hot count vector j[151]; every additive table effect is
    ``histogram · (j @ table)`` (small matmuls, exact for ints in f32), and
    every multiplicative effect is an integer-exponent power of an exact base
    (2 / 1.5 / 3), so float results are bit-identical to the per-entity
    product. Profiling showed the previous gather formulation lowered to
    serialized dynamic-slices on TPU and dominated the whole env step.
    """
    f32 = jnp.float32
    jvalid = jokers > 0
    njok = jnp.sum(jvalid).astype(jnp.int32)
    A = jnp.asarray

    # Multi-hot joker counts [151] (row 0 = empty slots; all tables/flag
    # reads at index 0 are zero so it is harmless).
    j151 = jnp.sum(
        (jokers[:, None] == jnp.arange(JT.NUM_JOKERS)) & jvalid[:, None],
        axis=0).astype(f32)

    def jdot(table):  # Σ_j table[j, :] over held jokers -> [K] f32
        return j151 @ A(table).astype(f32)

    def cnt(jid):  # how many of joker `jid` are held (0/1 in practice)
        return j151[jid]

    # Histograms of scoring cards (exact small ints in f32).
    r_oh = (ranks[:, None] == jnp.arange(15)).astype(f32)        # [C,15]
    s_oh = (suits[:, None] == jnp.arange(JT.NUM_SUIT_CATS)).astype(f32)
    sm = smask.astype(f32)
    rank_hist = sm @ r_oh                                        # [15]
    suit_hist = sm @ s_oh                                        # [5]
    ht_oh = (ht == jnp.arange(12)).astype(f32)                   # [12]

    # ---- individual scoring: histogram · (j @ table) ----
    chips_f = rank_hist @ jdot(t.ind_chip_rank) + suit_hist @ jdot(t.ind_chip_suit)
    mult_f = rank_hist @ jdot(t.ind_mult_rank) + suit_hist @ jdot(t.ind_mult_suit)
    money_f = suit_hist @ jdot(t.ind_money_suit)

    # Triboulet (the only ind_x entry): ×2 per scoring Q/K per copy.
    qk = rank_hist[12] + rank_hist[13]
    e2 = cnt(JT.J_TRIBOULET) * qk

    # Bloodstone: 50% ×2 per (joker, scoring Heart) pair
    # (complete_joker_effects.py:161).
    coin, misprint = _joker_chance(key, jokers.shape[-1], ranks.shape[-1])
    blood_j = (jokers == JT.J_BLOODSTONE) & jvalid
    hearts = smask & (suits == 2)
    e2 = e2 + jnp.sum((blood_j[:, None] & hearts[None, :] & coin).astype(f32))

    # ---- main scoring ----
    n_scoring = jnp.sum(smask).astype(jnp.int32)
    chips_f += (jnp.sum(jdot(t.chips_flat))
                + ht_oh @ jdot(hand_table_chips)
                + cnt(JT.J_BANNER) * 30 * discards_left.astype(f32)
                + cnt(JT.J_BLUE_JOKER) * 2 * deck_size.astype(f32))

    # Misprint: +randint(0,23) (complete_joker_effects.py:42). The reference
    # draws from the unseeded global `random`; one draw per held copy (>1
    # copy cannot occur through the shop). Drawn in _joker_chance above.
    present5 = (suit_hist > 0).astype(f32)
    nqueens = jnp.sum(valid & (ranks == 12)).astype(f32)
    nkings = jnp.sum(valid & (ranks == 13)).astype(f32)
    mult_f += (jnp.sum(jdot(t.mult_flat))
               + ht_oh @ jdot(hand_table_mult)
               + cnt(JT.J_ABSTRACT) * 3 * njok.astype(f32)
               + cnt(JT.J_MYSTIC_SUMMIT) * jnp.where(discards_left == 0, 15.0, 0.0)
               + cnt(JT.J_HALF) * jnp.where(n_scoring <= 3, 20.0, 0.0)
               + cnt(JT.J_MISPRINT) * misprint
               + present5 @ jdot(t.mult_if_suit)
               + cnt(JT.J_SHOOT_THE_MOON) * 13 * nqueens)

    # ---- x-mult: integer exponents of exact bases ----
    all_spade_club = jnp.all(~valid | (suits == 3) | (suits == 0))
    seeing = (present5[0] > 0) & (jnp.sum(present5) > 1)
    # Flower Pot: exactly 4 distinct suit *strings* among scoring cards — the
    # reference's set includes 'Stone' as its own member (bug-faithful).
    flower = jnp.sum(present5) == 4
    e2 = e2 + ht_oh @ jdot(x2_hand) + cnt(JT.J_SEEING_DOUBLE) * seeing
    e3 = (ht_oh @ jdot(x3_hand)
          + jnp.sum(jdot(t.x3_flat))
          + cnt(JT.J_ACROBAT) * (hands_left == 1)
          + cnt(JT.J_BLACKBOARD) * all_spade_club
          + cnt(JT.J_FLOWER_POT) * flower)
    e15 = cnt(JT.J_BARON) * nkings
    # Table dots, not lax.pow: TPU pow is approximate for non-2 bases and
    # breaks the exact-x-mult contract (core/pow_tables.py docstring).
    x = P.pow2(e2, _F) * P.pow3(e3, _F) * P.pow15(e15, _F)

    return (chips_f.astype(_I64), mult_f.astype(_I64), x,
            money_f.astype(jnp.int32))


def score_sim(ranks, suits, valid, enh, ed, seal, base_value, jokers,
              hands_left, discards_left, deck_size, key,
              tables: JT.JokerTables | None = None):
    """``BalatroSimulator.calculate_score`` as a pure function.

    Args:
        ranks/suits/valid: [N] played cards (canonical suits 0..3).
        enh/ed/seal: [N] modifier channels (core.cards enums).
        base_value: [N] card chip values (fixture cards use A=11,
            balatro_sim_test.py:16-24).
        jokers: [J] joker ids (0 = empty).
        deck_size: len(game_state['deck']) in the SIM path = number of
            PURCHASED cards (balatro_sim.py:553), NOT the draw pile.
        key: PRNG key for the stochastic effects (lucky money, Bloodstone,
            Misprint).

    Returns (score i64, money_delta i32, hand_type i32, scoring_mask [N]).
    """
    t = tables or JT.get_tables()
    ff, sc = _joker_flags(jokers)
    ht, smask = evaluate_sim(ranks, suits, valid, ff, sc)
    smask = smask & valid

    chips = BASE_HAND_CHIPS[ht].astype(_I64)
    mult = BASE_HAND_MULT[ht].astype(_I64)
    chips += jnp.sum(jnp.where(smask, base_value, 0)).astype(_I64)

    # Card enhancements / editions / seals, sim semantics
    # (balatro_sim.py:455-488): applied BEFORE jokers. Gather-free: masked
    # histograms dotted with the static tables; x-mults as exact-base powers
    # (glass ×2, steel/poly ×1.5).
    f32 = jnp.float32
    sm = smask.astype(f32)
    enh_hist = sm @ (enh[:, None] == jnp.arange(9)).astype(f32)
    ed_hist = sm @ (ed[:, None] == jnp.arange(5)).astype(f32)
    chips += (enh_hist @ C.ENH_CHIPS.astype(f32)
              + ed_hist @ C.ED_CHIPS.astype(f32)).astype(_I64)
    add = (enh_hist @ C.ENH_MULT.astype(f32)
           + ed_hist @ C.ED_MULT.astype(f32)).astype(_I64)
    n_glass = enh_hist[C.Enhancement.GLASS]
    n_15 = enh_hist[C.Enhancement.STEEL] + ed_hist[C.Edition.POLYCHROME]
    x = P.pow2(n_glass, _F) * P.pow15(n_15, _F)
    n_gold_seal = jnp.sum(smask & (seal == C.Seal.GOLD))
    money = (3 * (enh_hist[C.Enhancement.GOLD].astype(jnp.int32)
                  + n_gold_seal.astype(jnp.int32)))
    # Lucky: +$1 at 20% per scoring lucky card (balatro_sim.py:473-474).
    k_lucky, k_jok = jax.random.split(key)
    lucky_roll = jax.random.uniform(k_lucky, valid.shape) < 0.2
    money += jnp.sum(jnp.where(smask & (enh == C.Enhancement.LUCKY) & lucky_roll, 1, 0)).astype(jnp.int32)

    # BUG-FAITHFUL joker context: the sim pipeline's game_state
    # (_create_game_state, balatro_sim.py:549-559) has NO 'hands_left' /
    # 'discards_left' keys and its 'deck' is the PURCHASED-cards list — so
    # Acrobat (get('hands_left',1)==1) and Mystic Summit
    # (get('discards_left',0)==0) ALWAYS fire, Banner contributes 0, and
    # Blue Joker counts only purchased cards (the `deck_size` argument here).
    # The real hands/discards arguments are accepted for API symmetry with
    # the env path but deliberately unused.
    del hands_left, discards_left
    jc, jm, jx, jmoney = _joker_pass(
        t, jokers, ranks, suits, smask, valid, ht,
        t.chips_hand_sim, t.mult_hand_sim, t.x2_hand_sim, t.x3_hand_sim,
        jnp.int32(1), jnp.int32(0), deck_size, k_jok,
    )
    chips += jc
    add += jm
    x = x * jx
    money += jmoney

    # final = int(chips * ((base_mult + add) * mult_mult)) (balatro_sim.py:543-544)
    final_mult = (mult + add).astype(_F) * x
    score = jnp.trunc(chips.astype(_F) * final_mult).astype(_I64)
    return score, money, ht, smask


def score_env_unified(ranks, suits, valid, enh, ed, levels, jokers,
                      hands_left, discards_left, deck_size, key,
                      tables: JT.JokerTables | None = None, ht=None):
    """``UnifiedScorer.score_hand`` for the flagship env path.

    scoring_cards == ALL selected cards (balatro_env_2.py:683-689). The hand
    is classified from the ORIGINAL ranks/suits (stone does not affect
    classification, balatro_env_2.py:669-671).

    BUG-FAITHFUL (PARITY #A38): NO joker effect fires in this path. All
    three UnifiedScorer joker loops guard ``isinstance(joker_name, str)``
    (unified_scoring.py:164-165, 187-188, 220-221), but the flagship state's
    ``to_dict()`` renders jokers as ``{'name','id'}`` DICTS
    (balatro_env_2.py:219) — the guard is always False, so no joker chips /
    mult / x-mult / money, no Misprint or Bloodstone draws, ever. Verified
    against the live reference (tests/test_reference_differential.py: a
    planted flat +4-mult Joker leaves the score and breakdown unchanged).
    The ``jokers``/``hands_left``/``discards_left``/``deck_size``/``key``
    arguments are kept for API symmetry with :func:`score_sim` (whose
    game_state carries joker NAMES, balatro_sim.py:555 — jokers DO fire
    there) and are deliberately unused.

    Returns (base_score i64, hand_type i32).
    """
    del jokers, hands_left, discards_left, deck_size, key, tables
    if ht is None:
        ht = classify_env(ranks, suits, valid)
    else:
        # The flagship env classifies from game.highlighted_indexes used as
        # DECK indices, accumulated across plays (#A39/#A40) — the caller
        # (engine/full_env._play_hand) computes that hand type and passes
        # it in; the selected cards here only contribute chip values.
        ht = jnp.asarray(ht, jnp.int32)
    smask = valid  # every selected card scores

    # Scoring reads the ScoreEngine's level, which apply_planet CLAMPS at 15
    # (scoring_engine.py:84) — while the obs-visible state.hand_levels
    # increments unclamped (balatro_env_2.py:1119). levels here carries the
    # unclamped obs values; min(level, 15) is exactly the engine's view
    # (both counters move together until the clamp). Live-verified by the
    # differential harness at level 16 (PARITY #A41).
    level = jnp.minimum(levels[ht], 15).astype(_I64)
    chips = BASE_HAND_CHIPS[ht].astype(_I64) + (level - 1) * 10
    mult = BASE_HAND_MULT[ht].astype(_I64) + (level - 1)

    # chip_value(): rank chips + enhancement chips + edition chips
    # (cards.py:262-267). The ONLY card-modifier contribution in this path.
    f32 = jnp.float32
    sm = smask.astype(f32)
    rank_hist = sm @ (ranks[:, None] == jnp.arange(15)).astype(f32)
    enh_hist = sm @ (enh[:, None] == jnp.arange(9)).astype(f32)
    ed_hist = sm @ (ed[:, None] == jnp.arange(5)).astype(f32)
    chips += (rank_hist @ C.RANK_CHIPS.astype(f32)
              + enh_hist @ C.ENH_CHIPS.astype(f32)
              + ed_hist @ C.ED_CHIPS.astype(f32)).astype(_I64)

    # final = int(chips * mult * x_mult) with x_mult == 1
    # (unified_scoring.py:288-290).
    score = jnp.trunc(chips.astype(_F) * mult.astype(_F)).astype(_I64)
    return score, ht
