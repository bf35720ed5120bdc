"""Plain-Python scoring oracles, used only by tests.

Independent re-derivations of the two reference scoring pipelines
(balatro_gym/balatro_sim.py:402-548 and unified_scoring.py:111-299 +
balatro_env_2.py chip_value semantics), written with dicts and loops — no
shared code with the optimized kernels in ops/scoring.py. The property tests
drive both on random hands/jokers and assert exact equality, guarding the
matmul/integer-exponent reformulation.

Stochastic effects (lucky money, Bloodstone, Misprint) are excluded by the
tests (no lucky cards, no Bloodstone/Misprint jokers) so results are
deterministic.
"""
from __future__ import annotations

from balatro_gym_tpu.core.cards import Edition, Enhancement, Seal
from balatro_gym_tpu.core.constants import SIM_HAND_NAMES
from balatro_gym_tpu.oracle.hand_oracle import classify_env_oracle, evaluate_sim_oracle

BASE = {
    0: (5, 1), 1: (10, 2), 2: (20, 2), 3: (30, 3), 4: (30, 4), 5: (35, 4),
    6: (40, 4), 7: (60, 7), 8: (100, 8), 9: (120, 12), 10: (140, 14),
    11: (160, 16),
}
RANK_CHIP = {r: (r if r <= 10 else (11 if r == 14 else 10)) for r in range(2, 15)}
ENH_CHIP = {Enhancement.BONUS: 30, Enhancement.STONE: 50}
ENH_MULT = {Enhancement.MULT: 4}
ED_CHIP = {Edition.FOIL: 50}
ED_MULT = {Edition.HOLOGRAPHIC: 10}

# joker id -> effect description (independent transcription of
# complete_joker_effects.py; ids from jokers.py)
# Greedy: Diamonds(1), Lusty: Hearts(2), Wrathful: Spades(3), Gluttonous: Clubs(0)
SUIT_JOKERS = {2: 1, 3: 2, 4: 3, 5: 0}
HAND_JOKERS = {
    6: ("Pair", 0, 8, 1), 7: ("Three of a Kind", 0, 12, 1),
    8: ("Two Pair", 0, 10, 1), 9: ("Straight", 0, 12, 1),
    10: ("Flush", 0, 10, 1), 11: ("Pair", 50, 0, 1),
    12: ("Three of a Kind", 100, 0, 1), 13: ("Two Pair", 80, 0, 1),
    14: ("Straight", 100, 0, 1), 15: ("Flush", 80, 0, 1),
    131: ("Pair", 0, 0, 2), 132: ("Three of a Kind", 0, 0, 3),
    133: ("Four of a Kind", 0, 0, 4), 134: ("Straight", 0, 0, 3),
    135: ("Flush", 0, 0, 2),
}
IND_RANK_MULT = {31: {2: 8, 3: 8, 5: 8, 8: 8, 14: 8},   # Fibonacci
                 39: {2: 4, 4: 4, 6: 4, 8: 4, 10: 4}}   # Even Steven
IND_RANK_CHIP = {40: {3: 31, 5: 31, 7: 31, 9: 31, 14: 31},  # Odd Todd
                 41: {14: 20}, 124: {2: 8},
                 33: {11: 30, 12: 30, 13: 30}}
IND_RANK_MULT2 = {41: {14: 4}, 104: {11: 5, 12: 5, 13: 5}}
WALKIE = 101


def _joker_effects(jokers, cards, scoring_idx, ht_name, hands_left,
                   discards_left, deck_size, enh_view=None):
    """(chips_add, mult_add, x_mult, money) per the joker engine, looped."""
    chips = mult = money = 0
    x = 1.0
    scoring = [cards[i] for i in scoring_idx]
    suits_scoring = set()
    for i in scoring_idx:
        r, s = cards[i]
        if enh_view and enh_view[i] == Enhancement.STONE:
            suits_scoring.add(4)
        else:
            suits_scoring.add(s)

    def view(i):
        r, s = cards[i]
        if enh_view and enh_view[i] == Enhancement.STONE:
            return 0, 4
        return r, s

    for j in jokers:
        if j == 0:
            continue
        # individual per-card effects
        for i in scoring_idx:
            r, s = view(i)
            chips += IND_RANK_CHIP.get(j, {}).get(r, 0)
            mult += IND_RANK_MULT.get(j, {}).get(r, 0)
            mult += IND_RANK_MULT2.get(j, {}).get(r, 0)
            if j == WALKIE and r in (4, 10):
                chips += 10
                mult += 4
            if j == 147 and r in (12, 13):  # Triboulet
                x *= 2.0
            if j == 118 and s == 3:  # Arrowhead spades
                chips += 50
            if j == 119 and s == 0:  # Onyx Agate clubs
                mult += 7
            if j == 116 and s == 1:  # Rough Gem diamonds
                money += 1
        # main scoring
        if j == 1:
            mult += 4
        if j == 136:
            chips += 250
        if j == 38:
            mult += 15
        if j == 61:
            x *= 3.0
        if j == 97:
            mult += 20
        if j == 50:
            chips += 100
        if j == 16 and len(scoring) <= 3:
            mult += 20
        if j == 34:
            mult += 3 * len([k for k in jokers if k != 0])
        if j == 108 and hands_left == 1:
            x *= 3.0
        if j == 23 and discards_left == 0:
            mult += 15
        if j == 22:
            chips += 30 * discards_left
        if j == 53:
            chips += 2 * deck_size
        if j in SUIT_JOKERS and SUIT_JOKERS[j] in suits_scoring:
            mult += 3
        if j in HAND_JOKERS:
            name, c_, m_, x_ = HAND_JOKERS[j]
            if ht_name == name:
                chips += c_
                mult += m_
                x *= x_
        if j == 48 and all(view(i)[1] in (0, 3) for i in range(len(cards))):
            x *= 3.0
        if j == 128 and 0 in suits_scoring and len(suits_scoring) > 1:
            x *= 2.0
        if j == 122 and len(suits_scoring) == 4:
            x *= 3.0
        if j == 72:
            kings = sum(1 for i in range(len(cards)) if view(i)[0] == 13)
            if kings:
                x *= 1.5 ** kings
        if j == 140:
            queens = sum(1 for i in range(len(cards)) if view(i)[0] == 12)
            if queens:
                mult += 13 * queens
    return chips, mult, x, money


def score_sim_oracle(cards, enh, ed, seal, jokers, hands_left, discards_left,
                     deck_size):
    """calculate_score pipeline, deterministic subset (no lucky/bloodstone)."""
    ff = 18 in jokers
    sc = 69 in jokers
    ht, sset = evaluate_sim_oracle(cards, ff, sc)
    scoring = sorted(sset)
    chips, mult = BASE[int(ht)]
    add = 0
    x = 1.0
    money = 0
    for i in scoring:
        r, _ = cards[i]
        chips += RANK_CHIP[r]
        chips += ENH_CHIP.get(enh[i], 0) + ED_CHIP.get(ed[i], 0)
        add += ENH_MULT.get(enh[i], 0) + ED_MULT.get(ed[i], 0)
        if enh[i] == Enhancement.GLASS:
            x *= 2.0
        if enh[i] == Enhancement.STEEL:
            x *= 1.5
        if ed[i] == Edition.POLYCHROME:
            x *= 1.5
        if enh[i] == Enhancement.GOLD:
            money += 3
        if seal[i] == Seal.GOLD:
            money += 3
    # Sim game_state lacks hands_left/discards_left; deck = purchased cards
    # (balatro_sim.py:549-559): Acrobat/Mystic always fire, Banner is 0.
    jc, jm, jx, jmoney = _joker_effects(
        jokers, cards, scoring, SIM_HAND_NAMES[int(ht)], 1, 0, deck_size)
    chips += jc
    add += jm
    x *= jx
    money += jmoney
    return int(chips * ((mult + add) * x)), money, int(ht)


def score_env_oracle(cards, enh, ed, levels, jokers, hands_left,
                     discards_left):
    """UnifiedScorer path: classify from originals, all selected score,
    modifiers contribute chips only.

    NO joker effects: the scorer's joker loops require string entries
    (unified_scoring.py:164/187/220 ``isinstance(joker_name, str)``) but the
    env state's to_dict() supplies {'name','id'} dicts (balatro_env_2.py:219)
    — PARITY #A38, verified live in tests/test_reference_differential.py."""
    del jokers, hands_left, discards_left
    ht = classify_env_oracle(cards)
    level = levels[int(ht)]
    base_c, base_m = BASE[int(ht)]
    chips = base_c + (level - 1) * 10
    mult = base_m + (level - 1)
    for i, (r, _) in enumerate(cards):
        chips += RANK_CHIP[r] + ENH_CHIP.get(enh[i], 0) + ED_CHIP.get(ed[i], 0)
    return int(chips * mult), int(ht)
