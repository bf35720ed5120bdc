"""Branch-free poker-hand evaluation kernels.

Two evaluators exist in the reference with *different* semantics, and both are
observable behaviour, so both are rebuilt here as pure, jit/vmap-friendly
functions over fixed-shape arrays:

* :func:`classify_env` — mirrors ``BalatroGame._classify_hand``
  (reference: balatro_gym/balatro_game.py:40-93). Counting-based, returns the
  hand type only. Notable bug-faithful quirks: five-of-a-kind is NOT
  recognised (falls through to high card / flush), flush requires *all* cards
  to share one suit and >=5 cards.

* :func:`evaluate_sim` — mirrors ``BalatroSimulator.evaluate_hand``
  (reference: balatro_gym/balatro_sim.py:108-366). Returns the top hand type
  AND the scoring-card mask, supports Four Fingers (4-card flush/straight) and
  Shortcut (one-gap straight) jokers, recognises Flush Five / Flush House /
  Five of a Kind, and scores ALL played cards for High Card
  (``get_highest`` returns the whole hand, balatro_sim.py:216-218).

Design: rank/suit histograms are computed via masked one-hot reductions; the
straight scan is a statically-unrolled 13-step recurrence over traced scalars
(ranks 14..2), exactly replicating the reference's stateful loop including the
carry of ``skipped_rank`` into the wheel (A-2-3-4-5) check
(balatro_sim.py:175-213). All control flow is ``jnp.where`` — no data-dependent
Python branches, so ``vmap`` over tens of thousands of envs is free.
"""
from __future__ import annotations

import jax.numpy as jnp

from balatro_gym_tpu.core.constants import HandType

_R = jnp.arange(15, dtype=jnp.int32)


def rank_counts(ranks, valid):
    """[...,15] histogram of ranks among valid cards (one-hot reduction)."""
    oh = (ranks[..., :, None] == _R) & valid[..., :, None]
    return jnp.sum(oh, axis=-2).astype(jnp.int32)


def suit_counts(suits, valid):
    """[...,4] histogram of suits among valid cards."""
    oh = (suits[..., :, None] == jnp.arange(4, dtype=suits.dtype)) & valid[..., :, None]
    return jnp.sum(oh, axis=-2).astype(jnp.int32)


def _top_rank_where(mask15):
    """Highest rank index where mask is true; 0 if none."""
    return jnp.max(jnp.where(mask15, _R, 0), axis=-1)


# ---------------------------------------------------------------------------
# Env-path classifier (balatro_game.py:40-93)
# ---------------------------------------------------------------------------

def classify_env(ranks, suits, valid):
    """Hand type per ``BalatroGame._classify_hand``. Single env (vmap outside).

    Args: ranks [N] int (2..14, 0=empty), suits [N] int, valid [N] bool.
    Returns: int32 hand type (HandType).
    """
    n = jnp.sum(valid).astype(jnp.int32)
    rc = rank_counts(ranks, valid)
    sc = suit_counts(suits, valid)

    # counts[0], counts[1]: two largest per-rank counts.
    max_c = jnp.max(rc)
    arg = jnp.argmax(rc)
    max2 = jnp.max(rc.at[arg].set(0))

    # Flush: all cards one suit AND >=5 cards (balatro_game.py:60).
    is_flush = (jnp.sum(sc > 0) == 1) & (n >= 5)

    # Straight: >=5 distinct ranks and a 5-consecutive window, or ace-low wheel
    # (balatro_game.py:63-73).
    present = rc > 0
    n_distinct = jnp.sum(present)
    win = jnp.stack([jnp.all(jnp.stack([present[r + k] for k in range(5)])) for r in range(2, 11)])
    ace_low = present[14] & present[2] & present[3] & present[4] & present[5]
    is_straight = (n_distinct >= 5) & (jnp.any(win) | ace_low)

    ht = jnp.int32(HandType.HIGH_CARD)
    ht = jnp.where((max_c == 2), jnp.int32(HandType.ONE_PAIR), ht)
    ht = jnp.where((max_c == 2) & (max2 == 2), jnp.int32(HandType.TWO_PAIR), ht)
    ht = jnp.where(max_c == 3, jnp.int32(HandType.THREE_KIND), ht)
    ht = jnp.where(is_straight & (n >= 5), jnp.int32(HandType.STRAIGHT), ht)
    ht = jnp.where(is_flush & (n >= 5), jnp.int32(HandType.FLUSH), ht)
    ht = jnp.where((max_c == 3) & (max2 == 2), jnp.int32(HandType.FULL_HOUSE), ht)
    ht = jnp.where(max_c == 4, jnp.int32(HandType.FOUR_KIND), ht)
    ht = jnp.where(is_straight & is_flush & (n >= 5), jnp.int32(HandType.STRAIGHT_FLUSH), ht)
    return ht


# ---------------------------------------------------------------------------
# Sim-path evaluator (balatro_sim.py:108-366)
# ---------------------------------------------------------------------------

def _straight_scan(present, can_skip, required, positions_valid):
    """Replicates get_straight's descending scan (balatro_sim.py:170-213).

    Returns (found, rank_in_t[15], skipped_final) where rank_in_t marks ranks
    whose cards were accumulated into ``t`` at break time.
    """
    zero15 = jnp.zeros(15, dtype=bool)
    run_len = jnp.int32(0)
    skipped = jnp.zeros((), bool)
    found = jnp.zeros((), bool)
    tmask = zero15

    for r in range(14, 1, -1):  # 14 down to 2, statically unrolled
        pres = present[r]
        # On present: extend run, add rank r to t.
        run_p = run_len + 1
        t_p = tmask.at[r].set(True)
        sk_p = skipped
        # On absent: consume the one allowed skip, else reset.
        do_skip = can_skip & ~skipped
        run_a = jnp.where(do_skip, run_len, 0)
        t_a = jnp.where(do_skip, tmask, zero15)
        sk_a = jnp.where(do_skip, True, False)

        new_run = jnp.where(pres, run_p, run_a)
        new_t = jnp.where(pres, t_p, t_a)
        new_sk = jnp.where(pres, sk_p, sk_a)
        new_found = new_run >= required

        # Freeze once found (reference breaks out of the loop).
        run_len = jnp.where(found, run_len, new_run)
        tmask = jnp.where(found, tmask, new_t)
        skipped = jnp.where(found, skipped, new_sk)
        found = found | new_found

    return found, tmask, skipped


def _wheel_scan(present, can_skip, skipped_in, required):
    """Replicates the wheel (A-2-3-4-5) check incl. skipped-carry bug
    (balatro_sim.py:192-208). Returns (found, rank_in_t[15])."""
    zero15 = jnp.zeros(15, dtype=bool)
    wl = jnp.int32(0)
    wmask = zero15
    skipped = skipped_in
    dead = jnp.zeros((), bool)
    for r in (14, 2, 3, 4, 5):
        pres = present[r] & ~dead
        wl = jnp.where(pres, wl + 1, wl)
        wmask = jnp.where(pres, wmask.at[r].set(True), wmask)
        # absent (and not dead): skip once if allowed, else break.
        absent = ~present[r] & ~dead
        do_skip = absent & can_skip & ~skipped
        skipped = jnp.where(do_skip, True, skipped)
        dead = dead | (absent & ~do_skip)
    return wl >= required, wmask


def macro_select(ranks, suits, valid, strategy):
    """Card-selection mask for the macro-action env's play strategies
    (reference: balatro_gym/balatro_env_v2.py:213-232).

    strategy: 0 best-detected hand, 1 first-5, 2 pair, 3 two-pair,
    4 three-of-a-kind, 5 flush — each falling back to the first k valid
    cards when the pattern is absent (k = 5/5/2/4/3/5).
    """
    N = ranks.shape[-1]
    pos = jnp.arange(N, dtype=jnp.int32)
    rc = rank_counts(ranks, valid)
    rmask = ranks.astype(jnp.int32)

    def first_k(k):
        csum = jnp.cumsum(valid.astype(jnp.int32))
        return valid & (csum <= k)

    def first_k_of_rank(rank, k):
        m = (rmask == rank) & valid
        return m & (jnp.cumsum(m.astype(jnp.int32)) <= k)

    # The reference CASCADES groups (balatro_sim.py:355-364): the 'Pair'
    # entry is overwritten with the top 2 of the 3-kind entry, which itself
    # cascades from 4/5-kind — so rank precedence for pair/trips targets is
    # rc==5 > rc==4 > rc==3 > rc==2.
    e5, e4, e3, e2 = (rc == 5), (rc == 4), (rc == 3), (rc == 2)
    r5, r4, r3, r2 = (_top_rank_where(m) for m in (e5, e4, e3, e2))
    has5, has4, has3, has2 = (jnp.any(m) for m in (e5, e4, e3, e2))

    pair_rank = jnp.where(has5, r5, jnp.where(has4, r4, jnp.where(has3, r3, r2)))
    m_pair = jnp.where(has5 | has4 | has3 | has2,
                       first_k_of_rank(pair_rank, 2), first_k(2))
    trips_rank = jnp.where(has5, r5, jnp.where(has4, r4, r3))
    m_trips = jnp.where(has5 | has4 | has3,
                        first_k_of_rank(trips_rank, 3), first_k(3))

    # Two Pair entry exists iff EXACTLY two exact-pairs, or one exact-trips
    # plus one exact-pair (pair+trips = 5 cards, balatro_sim.py:331-343).
    n2 = jnp.sum(e2)
    n3 = jnp.sum(e3)
    p1 = r2
    p2 = _top_rank_where(e2 & (_R != p1))
    two_pairs = ((rmask == p1) | (rmask == p2)) & valid
    pair_plus_trips = ((rmask == p1) | (rmask == r3)) & valid
    has_2pair = (n2 == 2) | ((n3 == 1) & (n2 == 1))
    m_2pair = jnp.where(n2 == 2, two_pairs,
                        jnp.where(has_2pair, pair_plus_trips, first_k(4)))

    sc = suit_counts(suits, valid)
    n = jnp.sum(valid)
    has_flush = (n <= 5) & (jnp.max(sc) >= 5)
    flush_suit = jnp.argmax(sc).astype(suits.dtype)
    m_flush = jnp.where(has_flush, (suits == flush_suit) & valid, first_k(5))

    _, best_mask = evaluate_sim(ranks, suits, valid)
    m_best = jnp.where(jnp.any(best_mask), best_mask, first_k(5))

    strategy = jnp.asarray(strategy)
    mask = jnp.where(strategy == 0, m_best,
                     jnp.where(strategy == 1, first_k(5),
                               jnp.where(strategy == 2, m_pair,
                                         jnp.where(strategy == 3, m_2pair,
                                                   jnp.where(strategy == 4, m_trips,
                                                             m_flush)))))
    return mask


def evaluate_sim(ranks, suits, valid, four_fingers=False, shortcut=False):
    """Top hand type + scoring-card mask per ``evaluate_hand``.

    Args:
        ranks, suits, valid: [N] card arrays (N is static, typically 8; at
            most 5 of them valid for flush/straight detection to engage —
            matching get_flush/get_straight's ``len(hand) > 5`` bail-out).
        four_fingers, shortcut: traced or static booleans (joker modifiers).

    Returns: (hand_type int32, scoring_mask [N] bool).
    """
    N = ranks.shape[-1]
    pos = jnp.arange(N, dtype=jnp.int32)
    n = jnp.sum(valid).astype(jnp.int32)
    rc = rank_counts(ranks, valid)
    sc = suit_counts(suits, valid)
    present = rc > 0

    four_fingers = jnp.asarray(four_fingers, bool)
    shortcut = jnp.asarray(shortcut, bool)

    # Exact-count rank masks (get_x_same matches exact group sizes,
    # balatro_sim.py:108-126).
    e5, e4, e3, e2 = (rc == 5), (rc == 4), (rc == 3), (rc == 2)
    has5, has4, has3, has2 = map(jnp.any, (e5, e4, e3, e2))
    top5, top4, top3 = _top_rank_where(e5), _top_rank_where(e4), _top_rank_where(e3)
    p1 = _top_rank_where(e2)
    p2 = _top_rank_where(e2 & (_R != p1))
    num_pairs = jnp.sum(e2)

    # Flush (balatro_sim.py:128-149): needs required<=n<=5.
    req_f = jnp.where(four_fingers, 4, 5)
    size_ok = (n <= 5) & (n >= req_f)
    flush_suit = jnp.argmax(sc).astype(jnp.int32)
    has_flush = size_ok & (jnp.max(sc) >= req_f)

    # Straight (balatro_sim.py:151-213): same size gate.
    req_s = jnp.where(four_fingers, 4, 5)
    s_found, s_tmask, s_skipped = _straight_scan(present, shortcut, req_s, valid)
    w_found, w_tmask = _wheel_scan(present, shortcut, s_skipped, req_s)
    has_straight = size_ok & (s_found | w_found)
    use_wheel = ~s_found & w_found

    # Straight scoring mask = t[:required]: cards of run ranks, ordered by
    # (descending rank | wheel order), position ascending; first `req_s` kept.
    # Per-card rank lookups as masked any-reductions (gather-free).
    r_eq = ranks[:, None] == _R                        # [N,15]
    in_main = jnp.any(r_eq & s_tmask, axis=-1) & valid
    in_wheel = jnp.any(r_eq & w_tmask, axis=-1) & valid
    in_t = jnp.where(use_wheel, in_wheel, in_main)
    # Order keys (smaller = earlier in t).
    wheel_order = jnp.array([99, 99, 1, 2, 3, 4, 99, 99, 99, 99, 99, 99, 99, 99, 0], dtype=jnp.int32)
    key_main = (14 - ranks.astype(jnp.int32)) * N + pos
    key_wheel = jnp.sum(jnp.where(r_eq, wheel_order, 0), axis=-1) * N + pos
    key = jnp.where(use_wheel, key_wheel, key_main)
    key = jnp.where(in_t, key, jnp.int32(10_000))
    order = jnp.sum(key[:, None] > key[None, :], axis=-1)  # rank of each key
    straight_mask = in_t & (order < req_s)

    flush_mask = (suits == flush_suit) & valid

    # --- top hand-type priority (balatro_sim.py:255-354) ---
    ht = jnp.int32(HandType.HIGH_CARD)
    two_pair_ok = (num_pairs == 2) | ((jnp.sum(e3) == 1) & (num_pairs == 1))
    ht = jnp.where(has2, jnp.int32(HandType.ONE_PAIR), ht)
    ht = jnp.where(two_pair_ok, jnp.int32(HandType.TWO_PAIR), ht)
    ht = jnp.where(has3, jnp.int32(HandType.THREE_KIND), ht)
    ht = jnp.where(has_straight, jnp.int32(HandType.STRAIGHT), ht)
    ht = jnp.where(has_flush, jnp.int32(HandType.FLUSH), ht)
    ht = jnp.where(has3 & has2, jnp.int32(HandType.FULL_HOUSE), ht)
    ht = jnp.where(has4, jnp.int32(HandType.FOUR_KIND), ht)
    ht = jnp.where(has_flush & has_straight, jnp.int32(HandType.STRAIGHT_FLUSH), ht)
    ht = jnp.where(has5, jnp.int32(HandType.FIVE_KIND), ht)
    ht = jnp.where(has3 & has2 & has_flush, jnp.int32(HandType.FLUSH_HOUSE), ht)
    ht = jnp.where(has5 & has_flush, jnp.int32(HandType.FLUSH_FIVE), ht)

    # --- scoring-card masks per top type ---
    rmask = ranks.astype(jnp.int32)
    m_5kind = (rmask == top5) & valid
    m_4kind = (rmask == top4) & valid
    m_house = ((rmask == top3) | (rmask == p1)) & valid
    m_trips = (rmask == top3) & valid
    m_2pair = ((rmask == p1) | (rmask == p2)) & valid
    m_pair = (rmask == p1) & valid
    m_sflush = flush_mask | straight_mask  # union (balatro_sim.py:281-292)

    mask = valid  # High Card: every played card scores (get_highest)
    mask = jnp.where(ht == HandType.ONE_PAIR, m_pair, mask)
    mask = jnp.where(ht == HandType.TWO_PAIR, m_2pair, mask)
    mask = jnp.where(ht == HandType.THREE_KIND, m_trips, mask)
    mask = jnp.where(ht == HandType.STRAIGHT, straight_mask, mask)
    mask = jnp.where(ht == HandType.FLUSH, flush_mask, mask)
    mask = jnp.where(ht == HandType.FULL_HOUSE, m_house, mask)
    mask = jnp.where(ht == HandType.FOUR_KIND, m_4kind, mask)
    mask = jnp.where(ht == HandType.STRAIGHT_FLUSH, m_sflush, mask)
    mask = jnp.where(ht == HandType.FIVE_KIND, m_5kind, mask)
    mask = jnp.where(ht == HandType.FLUSH_HOUSE, m_house, mask)
    mask = jnp.where(ht == HandType.FLUSH_FIVE, m_5kind, mask)
    return ht, mask
