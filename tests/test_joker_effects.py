"""Golden tests for individual joker effects (complete_joker_effects.py
semantics through the sim scoring pipeline)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balatro_gym_tpu.core.cards import RANK_CHIPS, Suit
from balatro_gym_tpu.ops import joker_tables as JT
from balatro_gym_tpu.ops.scoring import score_sim

S, H, D, Cl = int(Suit.SPADES), int(Suit.HEARTS), int(Suit.DIAMONDS), int(Suit.CLUBS)


def score(cards, jokers=(), hands_left=4, discards_left=3, deck=44, seed=0):
    N = 8
    ranks = np.zeros(N, np.int32)
    suits = np.zeros(N, np.int32)
    valid = np.zeros(N, bool)
    for i, (r, s) in enumerate(cards):
        ranks[i], suits[i], valid[i] = r, s, True
    jok = np.zeros(5, np.int32)
    for i, j in enumerate(jokers):
        jok[i] = j
    zeros = jnp.zeros(N, jnp.int32)
    out = jax.jit(score_sim)(
        jnp.asarray(ranks), jnp.asarray(suits), jnp.asarray(valid),
        zeros, zeros, zeros, RANK_CHIPS[jnp.asarray(ranks)],
        jnp.asarray(jok), jnp.int32(hands_left), jnp.int32(discards_left),
        jnp.int32(deck), jax.random.key(seed))
    return int(out[0]), int(out[1])


ACE = [(14, S)]  # high card: chips 5+11=16, mult 1


def test_suit_jokers_fire_on_scoring_suit():
    # Greedy Joker: +3 mult if any scoring Diamond.
    s, _ = score([(14, D)], jokers=[JT.J_GREEDY])
    assert s == 16 * 4
    s, _ = score(ACE, jokers=[JT.J_GREEDY])  # spade: no fire
    assert s == 16


def test_banner_dead_in_sim_context():
    # Sim game_state lacks 'discards_left' -> get(...,0): Banner adds 0
    # (balatro_sim.py:549-559 + complete_joker_effects.py:50).
    s, _ = score(ACE, jokers=[JT.J_BANNER], discards_left=3)
    assert s == 16


def test_blue_joker_purchased_deck_chips():
    # 'deck' in the sim context = PURCHASED cards: +2 per purchased card.
    s, _ = score(ACE, jokers=[JT.J_BLUE_JOKER], deck=44)
    assert s == 104
    s, _ = score(ACE, jokers=[JT.J_BLUE_JOKER], deck=0)
    assert s == 16


def test_abstract_per_joker():
    # +3 mult per held joker (2 held): 16 * (1 + 6) = 112 (Banner adds 0
    # in the sim context).
    s, _ = score(ACE, jokers=[JT.J_ABSTRACT, JT.J_BANNER], discards_left=0)
    assert s == 16 * 7


def test_mystic_summit_always_fires_in_sim_context():
    # No 'discards_left' key -> get(...,0)==0 is always true in the sim path.
    s, _ = score(ACE, jokers=[JT.J_MYSTIC_SUMMIT], discards_left=0)
    assert s == 16 * 16
    s, _ = score(ACE, jokers=[JT.J_MYSTIC_SUMMIT], discards_left=1)
    assert s == 16 * 16


def test_half_joker_small_hands():
    s, _ = score(ACE, jokers=[JT.J_HALF])
    assert s == 16 * 21  # <=3 scoring cards: +20 mult
    s, _ = score([(2, S), (5, H), (7, D), (9, Cl), (11, S)], jokers=[JT.J_HALF])
    # 5 scoring (high card scores all): no fire: (5+2+5+7+9+10)*1
    assert s == 38


def test_acrobat_always_fires_in_sim_context():
    # No 'hands_left' key -> get(...,1)==1 is always true in the sim path.
    s, _ = score(ACE, jokers=[JT.J_ACROBAT], hands_left=1)
    assert s == 16 * 3
    s, _ = score(ACE, jokers=[JT.J_ACROBAT], hands_left=2)
    assert s == 16 * 3


def test_baron_kings_multiplier():
    # x1.5 per King among played cards: pair of kings (10+10+10)*2 * 1.5^2.
    s, _ = score([(13, S), (13, H)], jokers=[JT.J_BARON])
    assert s == int(30 * 2 * 2.25)


def test_blackboard_all_spades_clubs():
    s, _ = score([(9, S), (4, Cl)], jokers=[JT.J_BLACKBOARD])
    assert s == (5 + 9 + 4) * 3  # high card scores all, x3
    s, _ = score([(9, S), (4, H)], jokers=[JT.J_BLACKBOARD])
    assert s == 18


def test_the_duo_x2_on_pair():
    s, _ = score([(9, S), (9, H)], jokers=[JT.J_THE_DUO])
    assert s == (10 + 18) * 2 * 2


def test_walkie_talkie_tens_and_fours():
    # +10 chips +4 mult per scoring 10 or 4: pair of 10s.
    s, _ = score([(10, S), (10, H)], jokers=[JT.J_WALKIE_TALKIE])
    assert s == (10 + 20 + 20) * (2 + 8)


def test_scary_face_chips():
    # +30 chips per scoring face card: lone king (5+10+30)*1.
    s, _ = score([(13, S)], jokers=[JT.J_SCARY_FACE])
    assert s == 45


def test_smiley_face_mult():
    s, _ = score([(13, S)], jokers=[JT.J_SMILEY_FACE])
    assert s == 15 * 6


def test_triboulet_kings_queens():
    # x2 per scoring K/Q: K+Q high card (5+10+10) * 1 * 4.
    s, _ = score([(13, S), (12, H)], jokers=[JT.J_TRIBOULET])
    assert s == 100


def test_arrowhead_spade_chips():
    s, _ = score([(7, S), (3, S)], jokers=[JT.J_ARROWHEAD])
    assert s == 5 + 7 + 3 + 100  # +50 chips per scoring spade


def test_onyx_agate_club_mult():
    s, _ = score([(7, Cl), (3, Cl)], jokers=[JT.J_ONYX_AGATE])
    assert s == (5 + 7 + 3) * (1 + 14)


def test_rough_gem_diamond_money():
    _, money = score([(7, D), (3, D)], jokers=[JT.J_ROUGH_GEM])
    assert money == 2  # $1 per scoring diamond


def test_stuntman_flat_chips():
    s, _ = score(ACE, jokers=[JT.J_STUNTMAN])
    assert s == 16 + 250


def test_cavendish_x3():
    s, _ = score(ACE, jokers=[JT.J_CAVENDISH])
    assert s == 48


def test_even_steven_and_odd_todd():
    s, _ = score([(8, S), (8, H)], jokers=[JT.J_EVEN_STEVEN])
    assert s == (10 + 16) * (2 + 8)  # +4 mult per scoring even card
    s, _ = score([(9, S), (9, H)], jokers=[JT.J_ODD_TODD])
    assert s == (10 + 18 + 62) * 2  # +31 chips per scoring odd card


def test_flower_pot_four_suits():
    cards = [(2, S), (5, H), (8, D), (11, Cl)]
    s, _ = score(cards, jokers=[JT.J_FLOWER_POT])
    base = 5 + 2 + 5 + 8 + 10
    assert s == base * 3
    # Three suits: no fire.
    s, _ = score([(2, S), (5, H), (8, D), (11, D)], jokers=[JT.J_FLOWER_POT])
    assert s == 5 + 2 + 5 + 8 + 10


def test_seeing_double_clubs_plus_other():
    s, _ = score([(2, Cl), (5, H)], jokers=[JT.J_SEEING_DOUBLE])
    assert s == (5 + 2 + 5) * 2
    s, _ = score([(2, Cl), (5, Cl)], jokers=[JT.J_SEEING_DOUBLE])
    assert s == 12  # clubs only: no second suit


def test_shoot_the_moon_queens():
    s, _ = score([(12, S), (12, H)], jokers=[JT.J_SHOOT_THE_MOON])
    assert s == (10 + 20) * (2 + 26)  # +13 mult per queen among played


def test_hand_type_jokers_sim_strings():
    # The Family fires on 'Four of a Kind' (sim path string).
    s, _ = score([(9, S), (9, H), (9, D), (9, Cl)], jokers=[JT.J_THE_FAMILY])
    assert s == (60 + 36) * 7 * 4
    # Crafty Joker: +80 chips on Flush.
    s, _ = score([(2, S), (5, S), (8, S), (9, S), (11, S)], jokers=[JT.J_CRAFTY])
    assert s == (35 + 2 + 5 + 8 + 9 + 10 + 80) * 4