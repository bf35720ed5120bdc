"""Golden-value tests for the sim scoring pipeline.

Expected values come from the reference's unit tests (tests/chips_test.py:3-25)
and the recorded trajectory fixture.
"""
import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.core.cards import RANK_CHIPS, Suit
from balatro_gym_tpu.ops.scoring import score_sim

S, H, D, Cl = int(Suit.SPADES), int(Suit.HEARTS), int(Suit.DIAMONDS), int(Suit.CLUBS)


def _score(cards, jokers=(0, 0, 0, 0, 0), enh=None, hands_left=4, discards_left=3, deck=44):
    N = 8
    ranks = np.zeros(N, np.int32)
    suits = np.zeros(N, np.int32)
    valid = np.zeros(N, bool)
    enh_a = np.zeros(N, np.int32)
    for i, (r, s) in enumerate(cards):
        ranks[i], suits[i], valid[i] = r, s, True
        if enh and i < len(enh):
            enh_a[i] = enh[i]
    ranks, suits, valid, enh_a = map(jnp.asarray, (ranks, suits, valid, enh_a))
    zeros = jnp.zeros(N, jnp.int32)
    score, money, ht, smask = jax.jit(score_sim)(
        ranks, suits, valid, enh_a, zeros, zeros, RANK_CHIPS[ranks],
        jnp.asarray(jokers, jnp.int32), jnp.int32(hands_left),
        jnp.int32(discards_left), jnp.int32(deck), jax.random.key(0),
    )
    return int(score), int(money)


def test_flush_five_ace():
    # A-flush-five: (160 + 5*11) * 16 = 3440 (chips_test.py)
    score, _ = _score([(14, S)] * 5)
    assert score == 3440


def test_flush_five_six():
    # 6-flush-five: (160 + 5*6) * 16 = 3040
    score, _ = _score([(6, S)] * 5)
    assert score == 3040


def test_straight_flushes():
    # 2-6 straight flush: (100+20)*8 = 960
    assert _score([(r, S) for r in (2, 3, 4, 5, 6)])[0] == 960
    # royal flush: (100+51)*8 = 1208
    assert _score([(r, S) for r in (10, 11, 12, 13, 14)])[0] == 1208
    # wheel straight flush: (100+25)*8 = 1000
    assert _score([(r, S) for r in (14, 2, 3, 4, 5)])[0] == 1000


def test_straight():
    # wheel straight, mixed suits: (30+25)*4 = 220
    assert _score([(14, S), (2, H), (3, D), (4, Cl), (5, S)])[0] == 220


def test_high_card_ace():
    # lone ace: (5+11)*1 = 16
    assert _score([(14, S)])[0] == 16


def test_high_card_scores_all_played():
    # get_highest returns the whole hand: J+10 high card = (5+10+10)*1 = 25
    assert _score([(11, S), (10, S)])[0] == 25


def test_joker_plus_4_mult():
    # 'Joker' (+4 mult): lone ace (5+11)*(1+4) = 80
    assert _score([(14, S)], jokers=(1, 0, 0, 0, 0))[0] == 80


def test_fibonacci_individual():
    # Fibonacci +8 mult per scoring 2/3/5/8/A. High card A Q 9 6 3:
    # scoring = all 5 (high card); fib cards = A,3 -> +16 mult.
    # chips = 5 + 11+10+9+6+3 = 44; mult = 1+16 = 17 -> 748.
    score, _ = _score([(14, H), (12, D), (9, Cl), (6, S), (3, H)], jokers=(31, 0, 0, 0, 0))
    assert score == 44 * 17


def test_hand_type_match_sim_path():
    # Jolly Joker (+8 mult if 'Pair') fires on the sim path.
    # Pair of 9s: chips 10+9+9=28, mult 2+8=10 -> 280.
    score, _ = _score([(9, H), (9, D)], jokers=(6, 0, 0, 0, 0))
    assert score == 280


def test_steel_glass_enhancements():
    # Steel ace scored: x1.5 (sim semantics). High card lone ace:
    # (5+11)*1*1.5 = 24.
    from balatro_gym_tpu.core.cards import Enhancement
    score, _ = _score([(14, H)], enh=[int(Enhancement.STEEL)])
    assert score == 24
    # Glass ace: x2 -> 32.
    score, _ = _score([(14, H)], enh=[int(Enhancement.GLASS)])
    assert score == 32
    # Bonus ace: +30 chips -> (5+11+30)*1 = 46.
    score, _ = _score([(14, H)], enh=[int(Enhancement.BONUS)])
    assert score == 46


def test_gold_enhancement_money():
    from balatro_gym_tpu.core.cards import Enhancement
    score, money = _score([(14, H)], enh=[int(Enhancement.GOLD)])
    assert score == 16 and money == 3
