"""Plain-Python oracle for hand evaluation, used only by tests.

Re-derivation of the two reference evaluators' semantics
(balatro_gym/balatro_game.py:40-93 and balatro_gym/balatro_sim.py:108-366)
written independently in terms of (rank, suit) int tuples. The jitted kernels
in ops/hand_eval.py are property-tested against this oracle over exhaustive
and random hands.
"""
from __future__ import annotations

from collections import Counter

from balatro_gym_tpu.core.constants import HandType


def classify_env_oracle(cards):
    """cards: list[(rank, suit)] -> HandType, per BalatroGame._classify_hand."""
    if not cards:
        return HandType.HIGH_CARD
    n = len(cards)
    rcount = Counter(r for r, _ in cards)
    scount = Counter(s for _, s in cards)
    counts = sorted(rcount.values(), reverse=True)
    is_flush = len(scount) == 1 and n >= 5

    distinct = sorted(set(r for r, _ in cards))
    is_straight = False
    if len(distinct) >= 5:
        for i in range(len(distinct) - 4):
            if distinct[i + 4] - distinct[i] == 4:
                is_straight = True
                break
        if not is_straight and 14 in distinct and {2, 3, 4, 5}.issubset(distinct):
            is_straight = True

    if is_straight and is_flush and n >= 5:
        return HandType.STRAIGHT_FLUSH
    if counts and counts[0] == 4:
        return HandType.FOUR_KIND
    if len(counts) >= 2 and counts[0] == 3 and counts[1] == 2:
        return HandType.FULL_HOUSE
    if is_flush and n >= 5:
        return HandType.FLUSH
    if is_straight and n >= 5:
        return HandType.STRAIGHT
    if counts and counts[0] == 3:
        return HandType.THREE_KIND
    if len(counts) >= 2 and counts[0] == 2 and counts[1] == 2:
        return HandType.TWO_PAIR
    if counts and counts[0] == 2:
        return HandType.ONE_PAIR
    return HandType.HIGH_CARD


def _x_same(num, hand):
    """Groups of exactly `num` equal-rank cards, highest rank first.
    Returns list of lists of positions."""
    by_rank = {}
    for i, (r, _) in enumerate(hand):
        by_rank.setdefault(r, []).append(i)
    out = []
    for r in sorted(by_rank, reverse=True):
        if len(by_rank[r]) == num:
            out.append(by_rank[r])
    return out


def _flush(hand, four_fingers):
    req = 4 if four_fingers else 5
    if len(hand) > 5 or len(hand) < req:
        return None
    # Reference iterates Spades, Hearts, Clubs, Diamonds; with <=5 cards only
    # one suit can reach `req`, so order is immaterial.
    by_suit = {}
    for i, (_, s) in enumerate(hand):
        by_suit.setdefault(s, []).append(i)
    for s, idxs in by_suit.items():
        if len(idxs) >= req:
            return idxs
    return None


def _straight(hand, four_fingers, shortcut):
    """Returns (positions list t[:req], skipped_flag_after_main) or (None, sk)."""
    req = 4 if four_fingers else 5
    if len(hand) > 5 or len(hand) < req:
        return None, False
    ids = {}
    for i, (r, _) in enumerate(hand):
        ids.setdefault(r, []).append(i)

    t, run, skipped, found = [], 0, False, False
    for r in range(14, 1, -1):
        if r in ids:
            run += 1
            t.extend(ids[r])
        else:
            if shortcut and not skipped:
                skipped = True
            else:
                run, t, skipped = 0, [], False
        if run >= req:
            found = True
            break
    if found:
        return t[:req], skipped

    # Wheel, with skipped carried over from the main loop (bug-faithful).
    wheel, wl = [], 0
    for r in (14, 2, 3, 4, 5):
        if r in ids:
            wl += 1
            wheel.extend(ids[r])
        else:
            if shortcut and not skipped:
                skipped = True
            else:
                break
    if wl >= req:
        return wheel, skipped  # sliced to req by the caller, like t[:required]
    return None, skipped


def evaluate_sim_oracle(cards, four_fingers=False, shortcut=False):
    """cards: list[(rank, suit)] -> (HandType, scoring positions set)."""
    req = 4 if four_fingers else 5
    g5, g4, g3, g2 = (_x_same(k, cards) for k in (5, 4, 3, 2))
    fl = _flush(cards, four_fingers)
    st, _sk = _straight(cards, four_fingers, shortcut)
    if st is not None:
        st = st[:req]

    allpos = list(range(len(cards)))
    if g5 and fl is not None:
        return HandType.FLUSH_FIVE, set(g5[0])
    if g3 and g2 and fl is not None:
        return HandType.FLUSH_HOUSE, set(g3[0]) | set(g2[0])
    if g5:
        return HandType.FIVE_KIND, set(g5[0])
    if fl is not None and st is not None:
        return HandType.STRAIGHT_FLUSH, set(fl) | set(st)
    if g4:
        return HandType.FOUR_KIND, set(g4[0])
    if g3 and g2:
        return HandType.FULL_HOUSE, set(g3[0]) | set(g2[0])
    if fl is not None:
        return HandType.FLUSH, set(fl)
    if st is not None:
        return HandType.STRAIGHT, set(st)
    if g3:
        return HandType.THREE_KIND, set(g3[0])
    if len(g2) == 2 or (len(g3) == 1 and len(g2) == 1):
        a = set(g2[0])
        b = set(g2[1]) if len(g2) > 1 else set(g3[0])
        return HandType.TWO_PAIR, a | b
    if g2:
        return HandType.ONE_PAIR, set(g2[0])
    return HandType.HIGH_CARD, set(allpos)
