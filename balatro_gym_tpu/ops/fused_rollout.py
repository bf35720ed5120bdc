"""Fused whole-rollout Pallas TPU kernel for the single-blind sim engine.

Motivation (profiling, scripts/profile_sim.py on the v5e chip): the jnp
``sim_env.rollout_random`` step is not dominated by any one computation —
stubbing the scorer, the hand evaluator, the joker pass, or the action
sampler each moves step time by only 4-11%. The cost is the *fixed overhead
of hundreds of tiny [8192, 8] ops* inside the scan body. The fix is one
kernel per rollout: env state lives in VMEM/vector registers across ALL
steps, every operation is an (8, L) full-occupancy VPU op, and the only HBM
traffic is the per-env joker coefficients in and the final states out.

Semantics are ``engine.sim_env``'s rollout-reachable subspace (the
mirror of the trajectory generator's game loop, balatro_sim_test.py:33-441):

* the hand always holds 8 cards (a fresh episode deals 8 of 52 and at most
  7 actions x 5 cards are consumed before the blind ends, so the deck never
  runs out mid-episode);
* actions select a PREFIX of 1..5 hand cards to play or discard
  (sim_env.decode_action); discards only legal while discards_left > 0;
* cards carry no enhancements/editions/seals (reset deals a bare deck and
  nothing in this engine enhances cards), so the enhancement stages of
  ``ops.scoring.score_sim`` contribute exactly zero and are elided;
* scoring follows ``BalatroSimulator.calculate_score`` exactly, via the
  same dense joker tables (ops/joker_tables.py) reduced per env ONCE before
  the kernel: every additive table becomes a per-env vector and every
  x-mult an integer exponent of an exact base (2 / 3 / 1.5), so all float
  arithmetic is exact in f32 for scores < 2**24;
* the fixture deck is arithmetic: card ``i`` has rank ``2 + i % 13`` and
  suit block (H, D, C, S) = (2, 1, 0, 3)[i // 13] (sim_env._fixture_deck),
  so drawing needs no table gather at all.

Two modes (static switch):

* ``actions=None`` (bench/training): actions are sampled uniformly over the
  legal set in-kernel via the TPU PRNG (``pltpu.prng_random_bits``) —
  distributionally identical to ``sim_env.random_legal_action`` (uniform
  over the mask), not bit-identical (different PRNG). The stochastic jokers
  Misprint / Bloodstone also roll in-kernel.
* ``actions=[n_steps, B]`` (validation): the kernel replays the given legal
  actions with NO PRNG anywhere; for joker sets without Misprint/Bloodstone
  the rollout is fully deterministic and must match the jnp engine
  BIT-EXACTLY on every state field (tests/test_fused_rollout.py, and
  scripts/validate_fused_tpu.py against the x64 CPU oracle).

Env batch layout: env ``e`` of a tile maps to (sublane ``e // L``, lane
``e % L``), so per-env scalars are full (8, L) vector registers and
per-card channels are (8, 8, L) — 100% VPU occupancy, no 1/8-sublane waste.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from balatro_gym_tpu.core.constants import HandType
from balatro_gym_tpu.ops import joker_tables as JT

N_CARDS = 8
SUB = 8          # env sublanes per tile
LANES = 256      # env lanes per tile
TILE = SUB * LANES

# Base hand values (scoring_engine.py:27-40) as python lists for unrolling.
_BASE_CHIPS = [5, 10, 20, 30, 30, 35, 40, 60, 100, 120, 140, 160]
_BASE_MULT = [1, 2, 2, 3, 4, 4, 4, 7, 8, 12, 14, 16]

# Scalar-row indices in the packed per-env coefficient array.
S_CHIPS_FLAT = 0   # sum of flat joker chips
S_MULT_CONST = 1   # flat mult + Mystic Summit (sim ctx: always) + Abstract
S_HALF20 = 2       # 20 * #Half Joker (fires when <=3 scoring cards)
S_MISPRINT = 3     # #Misprint (stochastic +randint(0,23) mult)
S_TRIB = 4         # #Triboulet (x2 per scoring Q/K)
S_BLOOD = 5        # #Bloodstone (50% x2 per scoring Heart)
S_SEEING = 6       # #Seeing Double (x2 if Club + another suit scoring)
S_BLACKB = 7       # #Blackboard (x3 if all played cards Spade/Club)
S_FLOWER = 8       # #Flower Pot (x3 if exactly 4 scoring suit cats)
S_E3_CONST = 9     # flat x3 exponents + Acrobat (sim ctx: always fires)
S_BARON = 10       # #Baron (x1.5 per King among played)
S_STM13 = 11       # 13 * #Shoot the Moon (per Queen among played)
S_FF = 12          # Four Fingers held (0/1)
S_SHORTCUT = 13    # Shortcut held (0/1)
S_BLIND = 14       # blind requirement
S_MONEY0 = 15      # initial money
N_SCAL = 16

# Fresh-episode hand: deck slots 51..44 = A K Q J 10 9 8 7 of Spades
# (sim_env._fixture_deck + _refill pop-from-end order).
_RESET_RANKS = [14, 13, 12, 11, 10, 9, 8, 7]
_RESET_SUIT = 3  # Suit.SPADES
_RESET_DECK_N = 44

_SUIT_OF_BLOCK = [2, 1, 0, 3]  # deck blocks: Hearts, Diamonds, Clubs, Spades


def _bits_u32(shape):
    """Random bits as uint32 (prng_random_bits yields i32; bitcast first so
    shifts/mods don't smear the sign bit)."""
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def _u32_to_f32(u):
    """Small uint32 -> f32 via int32 (Mosaic lacks a direct u32->f32 cast)."""
    return pltpu.bitcast(u, jnp.int32).astype(jnp.float32)


def _u01(bits):
    """uint32 random bits -> f32 uniform in [0, 1) (24-bit mantissa path)."""
    return _u32_to_f32(bits >> jnp.uint32(8)) * jnp.float32(2.0 ** -24)


def _deck_card(src):
    """(rank, suit) of fixture-deck slot ``src`` (arithmetic, no gather)."""
    b = ((src >= 13).astype(jnp.int32) + (src >= 26).astype(jnp.int32)
         + (src >= 39).astype(jnp.int32))
    rank = src - 13 * b + 2
    suit = jnp.where(b == 0, _SUIT_OF_BLOCK[0],
                     jnp.where(b == 1, _SUIT_OF_BLOCK[1],
                               jnp.where(b == 2, _SUIT_OF_BLOCK[2],
                                         _SUIT_OF_BLOCK[3])))
    return rank, suit


def _kernel(scal_ref, ranktab_ref, suittab_ref, handtab_ref, seed_ref,
            actions_ref, ranks_out, suits_out, stats_out, reward_out,
            *, n_steps: int, use_actions: bool):
    """One grid cell = TILE envs for the full n_steps rollout.

    Refs (B-tiles on dims 1/2/3 = (tile, SUB, LANES)):
      scal_ref    [N_SCAL, 1, SUB, L] f32 per-env scalar coefficients
      ranktab_ref [32, 1, SUB, L] f32: rows 0-15 ind-chip-by-rank,
                  16-31 ind-mult-by-rank (rank-indexed, rows 0/1 unused)
      suittab_ref [32, 1, SUB, L] f32: 4 blocks of 8 (suit cats 0-4 padded):
                  ind-chip, ind-mult, ind-money, mult-if-suit-present
      handtab_ref [64, 1, SUB, L] f32: 4 blocks of 16 (hand types 0-11
                  padded): chips, mult, x2-exponent, x3-exponent
      seed_ref    [1, 1] i32 (SMEM)
      actions_ref [n_steps or 1, 1, SUB, L] i32
    Outs:
      ranks_out/suits_out [N_CARDS, 1, SUB, L] i32 final hand
      stats_out [8, 1, SUB, L] i32: deck_n, money, hands_left,
                  discards_left, score, episodes, done, spare
      reward_out [1, 1, SUB, L] f32 total reward
    """
    f32, i32 = jnp.float32, jnp.int32

    if not use_actions:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

    # Per-env constants, read once into registers.
    scal = [scal_ref[r, 0] for r in range(N_SCAL)]           # (SUB, L) f32 each
    icr = [ranktab_ref[r, 0] for r in range(15)]             # rank r chips
    imr = [ranktab_ref[16 + r, 0] for r in range(15)]        # rank r mult
    ics = [suittab_ref[s, 0] for s in range(5)]              # suit s chips
    ims = [suittab_ref[8 + s, 0] for s in range(5)]
    imoney = [suittab_ref[16 + s, 0] for s in range(5)]
    mis = [suittab_ref[24 + s, 0] for s in range(5)]         # if-suit-present
    hchips = [handtab_ref[h, 0] for h in range(12)]
    hmult = [handtab_ref[16 + h, 0] for h in range(12)]
    hx2 = [handtab_ref[32 + h, 0] for h in range(12)]
    hx3 = [handtab_ref[48 + h, 0] for h in range(12)]

    req = jnp.where(scal[S_FF] > 0, 4, 5).astype(i32)        # flush/straight size
    can_skip = scal[S_SHORTCUT] > 0                          # gapped straights
    blind = scal[S_BLIND].astype(i32)
    zero = jnp.zeros((SUB, LANES), f32)
    zero_i = jnp.zeros((SUB, LANES), i32)

    reset_rank = jnp.stack([jnp.full((SUB, LANES), r, i32) for r in _RESET_RANKS])
    reset_suit = jnp.full((N_CARDS, SUB, LANES), _RESET_SUIT, i32)

    def body(step, carry):
        (rank, suit, deck_n, money, hands_left, discards_left, score,
         tot_reward, episodes) = carry
        # rank/suit: (N_CARDS, SUB, L) i32; the rest (SUB, L).

        # ---- action ----
        if use_actions:
            action = actions_ref[step, 0]
        else:
            n_legal = jnp.where(discards_left > 0, 10, 5).astype(f32)
            u = _u01(_bits_u32((SUB, LANES)))
            action = (u * n_legal).astype(i32)               # uniform over legal
        is_disc = action >= 5
        k = jnp.where(is_disc, action - 5, action) + 1       # 1..5 prefix

        # ---- selection masks (prefix of k) ----
        # NOTE on mask dtypes: masks stay BOOL (XLA:CPU's optimizer hangs on
        # the equivalent i32-arithmetic formulation), but a select BETWEEN
        # bool vectors is never emitted — Mosaic cannot lower it ("Unsupported
        # target bitwidth for truncation"). Conditional bool updates are
        # written as pure bitwise logic: (pred & a) | (~pred & b).
        sel = [c < k for c in range(N_CARDS)]                # (SUB,L) bool each
        rk = [rank[c] for c in range(N_CARDS)]
        st = [suit[c] for c in range(N_CARDS)]

        # ---- rank/suit histograms of the selected cards ----
        rc = []                                              # rc[r] for r=2..14
        for r in range(2, 15):
            acc = zero_i
            for c in range(N_CARDS):
                acc = acc + (sel[c] & (rk[c] == r)).astype(i32)
            rc.append(acc)
        present = [x > 0 for x in rc]
        sc = []
        for s in range(4):
            acc = zero_i
            for c in range(N_CARDS):
                acc = acc + (sel[c] & (st[c] == s)).astype(i32)
            sc.append(acc)

        # ---- evaluate_hand (ops/hand_eval.evaluate_sim semantics) ----
        n = k  # all selected cards are valid (hand always holds 8)
        false_m = jnp.zeros((SUB, LANES), bool)
        has5 = has4 = has3 = has2 = false_m
        top5 = top4 = top3 = p1 = zero_i
        num_pairs = zero_i
        for i, r in enumerate(range(2, 15)):
            e5, e4, e3m, e2m = (rc[i] == 5), (rc[i] == 4), (rc[i] == 3), (rc[i] == 2)
            has5, has4, has3, has2 = has5 | e5, has4 | e4, has3 | e3m, has2 | e2m
            top5 = jnp.where(e5, r, top5)                    # ascending -> max wins
            top4 = jnp.where(e4, r, top4)
            top3 = jnp.where(e3m, r, top3)
            p1 = jnp.where(e2m, r, p1)
            num_pairs = num_pairs + e2m.astype(i32)
        p2 = zero_i
        for i, r in enumerate(range(2, 15)):
            p2 = jnp.where((rc[i] == 2) & (r != p1), r, p2)
        n_trips = zero_i
        for i in range(13):
            n_trips = n_trips + (rc[i] == 3).astype(i32)

        # Flush: requires req <= n <= 5; suit = first argmax (strict >).
        max_sc = sc[0]
        flush_suit = zero_i
        for s in range(1, 4):
            better = sc[s] > max_sc
            flush_suit = jnp.where(better, s, flush_suit)
            max_sc = jnp.maximum(max_sc, sc[s])
        size_ok = n >= req                                   # n <= 5 by decode
        has_flush = size_ok & (max_sc >= req)

        # Straight: descending scan 14..2 with one optional skip (Shortcut),
        # freezing at first run >= req; per-card membership accumulated.
        # Bool-state updates use bitwise logic, never select-between-bools.
        run = zero_i
        skipped = false_m
        found = false_m
        in_t = [false_m for _ in range(N_CARDS)]
        for r in range(14, 1, -1):
            pres = present[r - 2]
            do_skip = ~pres & can_skip & ~skipped
            new_run = jnp.where(pres, run + 1, jnp.where(do_skip, run, 0))
            new_sk = (pres & skipped) | (~pres & do_skip)
            keep_t = pres | do_skip
            upd = ~found                                     # freeze after found
            for c in range(N_CARDS):
                add_c = pres & sel[c] & (rk[c] == r)
                new_tc = keep_t & (in_t[c] | add_c)
                in_t[c] = (upd & new_tc) | (~upd & in_t[c])
            run = jnp.where(upd, new_run, run)
            skipped = (upd & new_sk) | (~upd & skipped)
            found = found | (run >= req)
        # Wheel A-2-3-4-5 with the skipped-carry quirk (balatro_sim.py:192-208).
        wl = zero_i
        wsk = skipped
        dead = false_m
        w_in = [false_m for _ in range(N_CARDS)]
        for r in (14, 2, 3, 4, 5):
            pres = present[r - 2] & ~dead
            wl = wl + pres.astype(i32)
            for c in range(N_CARDS):
                w_in[c] = w_in[c] | (pres & sel[c] & (rk[c] == r))
            absent = ~present[r - 2] & ~dead
            do_skip = absent & can_skip & ~wsk
            wsk = wsk | do_skip
            dead = dead | (absent & ~do_skip)
        w_found = wl >= req
        has_straight = size_ok & (found | w_found)
        use_wheel = ~found & w_found

        # Straight scoring mask: first `req` members in t-order
        # (descending rank / wheel order A,2,3,4,5; position ascending).
        wheel_key = [jnp.full((SUB, LANES), 99, i32) for _ in range(N_CARDS)]
        for c in range(N_CARDS):
            for wo, r in enumerate((14, 2, 3, 4, 5)):
                wheel_key[c] = jnp.where(rk[c] == r, wo, wheel_key[c])
        key = []
        for c in range(N_CARDS):
            in_tc = (use_wheel & w_in[c]) | (~use_wheel & in_t[c])
            kc = jnp.where(use_wheel, wheel_key[c], 14 - rk[c]) * N_CARDS + c
            key.append(jnp.where(in_tc, kc, 10_000))
        straight_m = []
        for c in range(N_CARDS):
            order = zero_i
            for j in range(N_CARDS):
                order = order + (key[c] > key[j]).astype(i32)
            straight_m.append((key[c] < 10_000) & (order < req))

        # Top hand type (priority chain, balatro_sim.py:255-354).
        HT = HandType
        two_pair_ok = (num_pairs == 2) | ((n_trips == 1) & (num_pairs == 1))
        ht = jnp.full((SUB, LANES), int(HT.HIGH_CARD), i32)
        for cond, v in (
            (has2, HT.ONE_PAIR), (two_pair_ok, HT.TWO_PAIR),
            (has3, HT.THREE_KIND), (has_straight, HT.STRAIGHT),
            (has_flush, HT.FLUSH), (has3 & has2, HT.FULL_HOUSE),
            (has4, HT.FOUR_KIND), (has_flush & has_straight, HT.STRAIGHT_FLUSH),
            (has5, HT.FIVE_KIND), (has3 & has2 & has_flush, HT.FLUSH_HOUSE),
            (has5 & has_flush, HT.FLUSH_FIVE),
        ):
            ht = jnp.where(cond, int(v), ht)

        # Scoring-card mask for the top type (bool; bitwise-conditional
        # accumulation instead of select-between-bools).
        smask = []
        for c in range(N_CARDS):
            m = sel[c]                                       # High Card: all
            rc_c = rk[c]
            flush_c = sel[c] & (st[c] == flush_suit)
            sf_c = flush_c | straight_m[c]
            for htv, mm in (
                (HT.ONE_PAIR, sel[c] & (rc_c == p1)),
                (HT.TWO_PAIR, sel[c] & ((rc_c == p1) | (rc_c == p2))),
                (HT.THREE_KIND, sel[c] & (rc_c == top3)),
                (HT.STRAIGHT, straight_m[c]),
                (HT.FLUSH, flush_c),
                (HT.FULL_HOUSE, sel[c] & ((rc_c == top3) | (rc_c == p1))),
                (HT.FOUR_KIND, sel[c] & (rc_c == top4)),
                (HT.STRAIGHT_FLUSH, sf_c),
                (HT.FIVE_KIND, sel[c] & (rc_c == top5)),
                (HT.FLUSH_HOUSE, sel[c] & ((rc_c == top3) | (rc_c == p1))),
                (HT.FLUSH_FIVE, sel[c] & (rc_c == top5)),
            ):
                is_h = ht == int(htv)
                m = (is_h & mm) | (~is_h & m)
            smask.append(m)

        # ---- score (BalatroSimulator.calculate_score, bare cards) ----
        # Scoring-card histograms.
        sh_r = []
        for r in range(2, 15):
            acc = zero
            for c in range(N_CARDS):
                acc = acc + (smask[c] & (rk[c] == r)).astype(f32)
            sh_r.append(acc)
        sh_s = []
        for s in range(4):
            acc = zero
            for c in range(N_CARDS):
                acc = acc + (smask[c] & (st[c] == s)).astype(f32)
            sh_s.append(acc)
        n_scoring = zero_i
        for c in range(N_CARDS):
            n_scoring = n_scoring + smask[c].astype(i32)

        # Base chips/mult by hand type + level-1 tables.
        chips = zero
        mult = zero
        for h in range(12):
            is_h = (ht == h).astype(f32)
            chips = chips + is_h * (_BASE_CHIPS[h] + hchips[h])
            mult = mult + is_h * (_BASE_MULT[h] + hmult[h])
        # Card base values of scoring cards (A=11, faces 10).
        for c in range(N_CARDS):
            bv = jnp.minimum(rk[c], 10) + (rk[c] == 14).astype(i32)
            chips = chips + jnp.where(smask[c], bv, 0).astype(f32)
        # Individual joker effects: rank/suit-indexed per-env vectors.
        for i in range(13):
            chips = chips + sh_r[i] * icr[i + 2]
            mult = mult + sh_r[i] * imr[i + 2]
        money_d = zero
        for s in range(4):
            chips = chips + sh_s[s] * ics[s]
            mult = mult + sh_s[s] * ims[s]
            money_d = money_d + sh_s[s] * imoney[s]
        # Flat + conditional adds.
        chips = chips + scal[S_CHIPS_FLAT]
        mult = mult + scal[S_MULT_CONST]
        mult = mult + jnp.where(n_scoring <= 3, scal[S_HALF20], 0.0)
        for s in range(4):
            mult = mult + (sh_s[s] > 0).astype(f32) * mis[s]
        nq = zero
        nk_ = zero
        for c in range(N_CARDS):
            nq = nq + (sel[c] & (rk[c] == 12)).astype(f32)
            nk_ = nk_ + (sel[c] & (rk[c] == 13)).astype(f32)
        mult = mult + scal[S_STM13] * nq
        if not use_actions:
            # Misprint: +randint(0, 23) mult per copy (stochastic).
            mbits = _bits_u32((SUB, LANES))
            mult = mult + scal[S_MISPRINT] * _u32_to_f32(mbits % jnp.uint32(24))

        # x-mult exponents (exact bases 2 / 3 / 1.5).
        e2 = scal[S_TRIB] * (sh_r[10] + sh_r[11])            # Q=12, K=13
        present_cats = zero
        for s in range(4):
            present_cats = present_cats + (sh_s[s] > 0).astype(f32)
        seeing = (sh_s[0] > 0) & (present_cats > 1)          # Clubs + other
        e2 = e2 + scal[S_SEEING] * seeing.astype(f32)
        if not use_actions:
            # Bloodstone: 50% x2 per scoring Heart (suit 2) per copy.
            bbits = _bits_u32((N_CARDS, SUB, LANES))
            coin3 = _u32_to_f32(bbits & jnp.uint32(1))
            blood = zero
            for c in range(N_CARDS):
                blood = blood + (smask[c] & (st[c] == 2)).astype(f32) * coin3[c]
            e2 = e2 + scal[S_BLOOD] * blood
        all_sc = ~false_m                                    # all ♠/♣ played
        for c in range(N_CARDS):
            all_sc = all_sc & (~sel[c] | (st[c] == 3) | (st[c] == 0))
        e3 = scal[S_E3_CONST] + scal[S_BLACKB] * all_sc.astype(f32)
        e3 = e3 + scal[S_FLOWER] * (present_cats == 4).astype(f32)
        e15 = scal[S_BARON] * nk_
        for h in range(12):
            is_h = (ht == h).astype(f32)
            e2 = e2 + is_h * hx2[h]
            e3 = e3 + is_h * hx3[h]
        # 2**e2 exactly via exponent-field bitcast; 3**e3 / 1.5**e15 by
        # bounded multiply chains (exponents are small integers).
        x = pltpu.bitcast(((e2.astype(i32) + 127) << 23), f32)
        p3 = jnp.ones((SUB, LANES), f32)
        for i in range(1, 13):  # e3 <= 12 (5 joker slots, all x3 sources)
            p3 = jnp.where(e3 >= i, p3 * 3.0, p3)
        p15 = jnp.ones((SUB, LANES), f32)
        for i in range(1, 21):  # e15 = #Barons (<=5 dup slots) x #Kings (<=4) <= 20
            p15 = jnp.where(e15 >= i, p15 * 1.5, p15)
        x = x * p3 * p15

        # final = int(chips * ((base_mult + adds) * x)) — exact in f32 for
        # scores < 2**24 (balatro_sim.py:543-544).
        delta = (chips * (mult * x)).astype(i32)

        # ---- step outcome ----
        new_score = score + delta
        beat = new_score >= blind
        play_reward = delta.astype(f32) / 100.0 + jnp.where(beat, 100.0, 0.0)
        reward = jnp.where(is_disc, -1.0, play_reward)

        score = jnp.where(is_disc, score, new_score)
        money = jnp.where(is_disc, money, money + money_d.astype(i32))
        hands_left = jnp.where(is_disc, hands_left,
                               jnp.where(beat, 0, hands_left - 1))
        discards_left = jnp.where(is_disc, discards_left - 1, discards_left)

        # ---- remove prefix k, refill from deck top ----
        new_rank, new_suit = [], []
        for c in range(N_CARDS):
            nr = zero_i
            ns = zero_i
            for s in range(1, 6):
                if c + s < N_CARDS:
                    cand_r, cand_s = rk[c + s], st[c + s]
                else:
                    src = deck_n + (N_CARDS - 1) - s - c     # j-th draw from top
                    cand_r, cand_s = _deck_card(src)
                is_s = k == s
                nr = jnp.where(is_s, cand_r, nr)
                ns = jnp.where(is_s, cand_s, ns)
            new_rank.append(nr)
            new_suit.append(ns)
        deck_n = deck_n - k

        # ---- episode end + in-place reset ----
        done = hands_left <= 0
        episodes = episodes + done.astype(i32)
        tot_reward = tot_reward + reward
        for c in range(N_CARDS):
            new_rank[c] = jnp.where(done, reset_rank[c], new_rank[c])
            new_suit[c] = jnp.where(done, reset_suit[c], new_suit[c])
        deck_n = jnp.where(done, _RESET_DECK_N, deck_n)
        money = jnp.where(done, scal[S_MONEY0].astype(i32), money)
        hands_left = jnp.where(done, 4, hands_left)
        discards_left = jnp.where(done, 3, discards_left)
        score = jnp.where(done, 0, score)

        return (jnp.stack(new_rank), jnp.stack(new_suit), deck_n, money,
                hands_left, discards_left, score, tot_reward, episodes)

    init = (reset_rank, reset_suit,
            jnp.full((SUB, LANES), _RESET_DECK_N, i32),
            scal[S_MONEY0].astype(i32),
            jnp.full((SUB, LANES), 4, i32),
            jnp.full((SUB, LANES), 3, i32),
            zero_i, zero, zero_i)
    (rank, suit, deck_n, money, hands_left, discards_left, score,
     tot_reward, episodes) = jax.lax.fori_loop(0, n_steps, body, init)

    ranks_out[:, 0] = rank
    suits_out[:, 0] = suit
    last_done = hands_left <= 0  # always False post-autoreset; kept for shape
    stats_out[0, 0] = deck_n
    stats_out[1, 0] = money
    stats_out[2, 0] = hands_left
    stats_out[3, 0] = discards_left
    stats_out[4, 0] = score
    stats_out[5, 0] = episodes
    stats_out[6, 0] = last_done.astype(jnp.int32)
    stats_out[7, 0] = jnp.zeros((SUB, LANES), jnp.int32)
    reward_out[0, 0] = tot_reward


def _to_tiles(x_rb, n_tiles):
    """[R, B] -> [R, n_tiles, SUB, LANES] (env e -> tile, sublane, lane)."""
    r = x_rb.shape[0]
    return x_rb.reshape(r, n_tiles, SUB, LANES)


def joker_coefficients(jokers, n_envs):
    """Reduce the dense joker tables to per-env coefficient rows (f32).

    jokers: [5] or [B, 5] i32 ids. Returns (scal [16,B], ranktab [32,B],
    suittab [32,B], handtab [64,B]) using the SIM-path game-state quirks
    (balatro_sim.py:549-559): Mystic Summit and Acrobat always fire, Banner
    and Blue Joker contribute 0 (missing ctx keys / purchased-cards deck).
    """
    t = JT.get_tables()
    jok = jnp.asarray(jokers, jnp.int32)
    if jok.ndim == 1:
        jok = jnp.broadcast_to(jok, (n_envs, jok.shape[0]))
    jv = jok > 0
    j151 = jnp.sum((jok[:, :, None] == jnp.arange(JT.NUM_JOKERS))
                   & jv[:, :, None], axis=1).astype(jnp.float32)  # [B,151]
    njok = jnp.sum(jv, axis=1).astype(jnp.float32)

    def dot(tab):
        return j151 @ jnp.asarray(tab, jnp.float32)

    def cnt(jid):
        return j151[:, jid]

    icr = dot(t.ind_chip_rank)            # [B,15]
    imr = dot(t.ind_mult_rank)
    ics = dot(t.ind_chip_suit)            # [B,5]
    ims = dot(t.ind_mult_suit)
    imoney = dot(t.ind_money_suit)
    mis = dot(t.mult_if_suit)
    hch = dot(t.chips_hand_sim)           # [B,12]
    hmu = dot(t.mult_hand_sim)
    hx2 = dot(t.x2_hand_sim)
    hx3 = dot(t.x3_hand_sim)

    B = j151.shape[0]
    scal = jnp.zeros((N_SCAL, B), jnp.float32)
    scal = scal.at[S_CHIPS_FLAT].set(dot(t.chips_flat))
    scal = scal.at[S_MULT_CONST].set(
        dot(t.mult_flat) + 15.0 * cnt(JT.J_MYSTIC_SUMMIT)
        + 3.0 * njok * cnt(JT.J_ABSTRACT))
    scal = scal.at[S_HALF20].set(20.0 * cnt(JT.J_HALF))
    scal = scal.at[S_MISPRINT].set(cnt(JT.J_MISPRINT))
    scal = scal.at[S_TRIB].set(cnt(JT.J_TRIBOULET))
    scal = scal.at[S_BLOOD].set(cnt(JT.J_BLOODSTONE))
    scal = scal.at[S_SEEING].set(cnt(JT.J_SEEING_DOUBLE))
    scal = scal.at[S_BLACKB].set(cnt(JT.J_BLACKBOARD))
    scal = scal.at[S_FLOWER].set(cnt(JT.J_FLOWER_POT))
    scal = scal.at[S_E3_CONST].set(dot(t.x3_flat) + cnt(JT.J_ACROBAT))
    scal = scal.at[S_BARON].set(cnt(JT.J_BARON))
    scal = scal.at[S_STM13].set(13.0 * cnt(JT.J_SHOOT_THE_MOON))
    scal = scal.at[S_FF].set((cnt(JT.J_FOUR_FINGERS) > 0).astype(jnp.float32))
    scal = scal.at[S_SHORTCUT].set((cnt(JT.J_SHORTCUT) > 0).astype(jnp.float32))
    scal = scal.at[S_BLIND].set(300.0)
    scal = scal.at[S_MONEY0].set(4.0)

    def pad_t(x, rows):
        out = jnp.zeros((rows, B), jnp.float32)
        return out.at[: x.shape[1]].set(x.T)

    ranktab = jnp.concatenate([pad_t(icr, 16), pad_t(imr, 16)])
    suittab = jnp.concatenate([pad_t(ics, 8), pad_t(ims, 8),
                               pad_t(imoney, 8), pad_t(mis, 8)])
    handtab = jnp.concatenate([pad_t(hch, 16), pad_t(hmu, 16),
                               pad_t(hx2, 16), pad_t(hx3, 16)])
    return scal, ranktab, suittab, handtab


@functools.partial(jax.jit, static_argnames=("n_envs", "n_steps",
                                             "use_actions", "interpret"))
def _rollout(seed, n_envs: int, n_steps: int, jokers, actions,
             use_actions: bool, interpret: bool):
    assert n_envs % TILE == 0, f"n_envs={n_envs} must be a multiple of {TILE}"
    n_tiles = n_envs // TILE
    scal, ranktab, suittab, handtab = joker_coefficients(jokers, n_envs)

    if use_actions:
        acts = jnp.asarray(actions, jnp.int32).reshape(n_steps, n_envs)
        acts = _to_tiles(acts, n_tiles)
        a_rows = n_steps
    else:
        acts = jnp.zeros((1, n_tiles, SUB, LANES), jnp.int32)
        a_rows = 1

    def blk(rows):
        return pl.BlockSpec((rows, 1, SUB, LANES), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)

    ranks, suits, stats, reward = pl.pallas_call(
        functools.partial(_kernel, n_steps=n_steps, use_actions=use_actions),
        grid=(n_tiles,),
        in_specs=[blk(N_SCAL), blk(32), blk(32), blk(64),
                  pl.BlockSpec(memory_space=pltpu.SMEM), blk(a_rows)],
        out_specs=(blk(N_CARDS), blk(N_CARDS), blk(8), blk(1)),
        out_shape=(
            jax.ShapeDtypeStruct((N_CARDS, n_tiles, SUB, LANES), jnp.int32),
            jax.ShapeDtypeStruct((N_CARDS, n_tiles, SUB, LANES), jnp.int32),
            jax.ShapeDtypeStruct((8, n_tiles, SUB, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, n_tiles, SUB, LANES), jnp.float32),
        ),
        interpret=interpret,
    )(_to_tiles(scal, n_tiles), _to_tiles(ranktab, n_tiles),
      _to_tiles(suittab, n_tiles), _to_tiles(handtab, n_tiles),
      jnp.asarray(seed, jnp.int32).reshape(1, 1), acts)

    def untile(x):
        return x.reshape(x.shape[0], n_envs)

    ranks, suits, stats = untile(ranks).T, untile(suits).T, untile(stats)
    return {
        "hand_rank": ranks,                   # [B, 8]
        "hand_suit": suits,
        "deck_n": stats[0], "money": stats[1], "hands_left": stats[2],
        "discards_left": stats[3], "score": stats[4], "episodes": stats[5],
        "total_reward": untile(reward)[0],    # [B] f32 per-env sums
    }


def rollout_fused(seed, n_envs: int, n_steps: int,
                  jokers=(0, 0, 0, 0, 0), *, actions=None,
                  interpret: bool = False):
    """Fused-kernel rollout. Returns a dict of final per-env state arrays
    plus per-env total reward and episode counts (see module docstring).

    actions: optional [n_steps, n_envs] (or [n_steps], broadcast) legal
    action ids 0-9 for deterministic replay; None samples uniformly over the
    legal set in-kernel.
    """
    use_actions = actions is not None
    if use_actions:
        actions = jnp.asarray(actions, jnp.int32)
        if actions.ndim == 1:
            actions = jnp.broadcast_to(actions[:, None], (actions.shape[0], n_envs))
    return _rollout(seed, n_envs, n_steps, jnp.asarray(jokers, jnp.int32),
                    actions, use_actions, interpret)
