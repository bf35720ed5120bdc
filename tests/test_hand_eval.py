"""Property tests: jitted hand evaluators vs the plain-Python oracle.

All hands are evaluated in ONE vmapped call per configuration (batched, the
way the engine actually runs) and compared element-wise against the oracle.
"""
import itertools
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balatro_gym_tpu.core.constants import HandType
from balatro_gym_tpu.ops.hand_eval import classify_env, evaluate_sim
from balatro_gym_tpu.oracle.hand_oracle import classify_env_oracle, evaluate_sim_oracle

N_SLOTS = 8


def _pack_batch(hands):
    B = len(hands)
    ranks = np.zeros((B, N_SLOTS), np.int32)
    suits = np.zeros((B, N_SLOTS), np.int32)
    valid = np.zeros((B, N_SLOTS), bool)
    for b, cards in enumerate(hands):
        for i, (r, s) in enumerate(cards):
            ranks[b, i], suits[b, i], valid[b, i] = r, s, True
    return jnp.asarray(ranks), jnp.asarray(suits), jnp.asarray(valid)


_classify_b = jax.jit(jax.vmap(classify_env))


def _eval_batch(hands, four_fingers=False, shortcut=False):
    f = jax.jit(jax.vmap(lambda r, s, v: evaluate_sim(r, s, v, four_fingers, shortcut)))
    ht, mask = f(*_pack_batch(hands))
    return np.asarray(ht), np.asarray(mask)


def _all_cards():
    return [(r, s) for r in range(2, 15) for s in range(4)]


def test_classify_env_golden():
    cases = [
        ([(14, 3), (13, 3), (12, 3), (11, 3), (10, 3)], HandType.STRAIGHT_FLUSH),
        ([(14, 3), (14, 2), (14, 1), (14, 0), (2, 3)], HandType.FOUR_KIND),
        ([(14, 3), (14, 2), (14, 1), (2, 0), (2, 3)], HandType.FULL_HOUSE),
        ([(14, 3), (2, 3), (7, 3), (9, 3), (12, 3)], HandType.FLUSH),
        ([(14, 3), (2, 2), (3, 1), (4, 0), (5, 3)], HandType.STRAIGHT),  # wheel
        ([(6, 3), (7, 2), (8, 1), (9, 0), (10, 3)], HandType.STRAIGHT),
        ([(14, 3), (14, 2), (14, 1), (2, 0), (3, 3)], HandType.THREE_KIND),
        ([(14, 3), (14, 2), (5, 1), (5, 0), (3, 3)], HandType.TWO_PAIR),
        ([(14, 3), (14, 2), (5, 1), (6, 0), (3, 3)], HandType.ONE_PAIR),
        ([(14, 3), (12, 2), (9, 1), (6, 0), (3, 3)], HandType.HIGH_CARD),
        # Bug-faithful: 5-of-a-kind is not recognised by the env classifier.
        ([(14, 3), (14, 2), (14, 1), (14, 0), (14, 3)], HandType.HIGH_CARD),
        # <5 cards: no flush/straight.
        ([(14, 3), (13, 3), (12, 3), (11, 3)], HandType.HIGH_CARD),
        ([(9, 1), (9, 2)], HandType.ONE_PAIR),
    ]
    got = np.asarray(_classify_b(*_pack_batch([c for c, _ in cases])))
    for (cards, want), g in zip(cases, got):
        assert int(g) == want, (cards, HandType(int(g)), want)


def test_classify_env_random_vs_oracle():
    rng = random.Random(7)
    deck = _all_cards()
    hands = [rng.sample(deck, rng.randint(1, 8)) for _ in range(4000)]
    got = np.asarray(_classify_b(*_pack_batch(hands)))
    for cards, g in zip(hands, got):
        want = int(classify_env_oracle(cards))
        assert int(g) == want, (cards, HandType(int(g)), HandType(want))


def test_evaluate_sim_exhaustive_ranks_one_suit():
    """All 5-rank multisets in one suit: straight/flush heavy coverage."""
    hands = [[(r, 3) for r in ranks]
             for ranks in itertools.combinations_with_replacement(range(2, 15), 5)]
    ht, mask = _eval_batch(hands)
    for cards, h, m in zip(hands, ht, mask):
        want_ht, want_pos = evaluate_sim_oracle(cards)
        got_pos = set(np.where(m[: len(cards)])[0])
        assert int(h) == int(want_ht), (cards, HandType(int(h)), want_ht)
        assert got_pos == want_pos, (cards, got_pos, want_pos, want_ht)


@pytest.mark.parametrize(
    "four_fingers,shortcut",
    [(False, False), (True, False), (False, True), (True, True)],
)
def test_evaluate_sim_random_vs_oracle(four_fingers, shortcut):
    rng = random.Random(int(four_fingers) * 2 + int(shortcut) + 11)
    deck = _all_cards()
    hands = [rng.sample(deck, rng.randint(1, 5)) for _ in range(4000)]
    ht, mask = _eval_batch(hands, four_fingers, shortcut)
    for cards, h, m in zip(hands, ht, mask):
        want_ht, want_pos = evaluate_sim_oracle(cards, four_fingers, shortcut)
        got_pos = set(np.where(m[: len(cards)])[0])
        assert int(h) == int(want_ht), (cards, HandType(int(h)), want_ht, four_fingers, shortcut)
        assert got_pos == want_pos, (cards, got_pos, want_pos, want_ht, four_fingers, shortcut)


def test_evaluate_sim_oversize_hand_no_flush():
    """>5 cards: get_flush/get_straight bail out; x-of-kind still works."""
    hands = [
        [(5, 3), (6, 3), (7, 3), (8, 3), (9, 3), (10, 3)],
        [(5, 0), (5, 1), (5, 2), (5, 3), (9, 3), (9, 2)],
    ]
    ht, mask = _eval_batch(hands)
    assert int(ht[0]) == HandType.HIGH_CARD
    assert int(ht[1]) == HandType.FOUR_KIND
    assert set(np.where(mask[1][:6])[0]) == {0, 1, 2, 3}
