"""Property tests: optimized scoring kernels vs independent Python oracles
over random hands, modifiers and joker loadouts (deterministic subset)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balatro_gym_tpu.core.cards import Edition, Enhancement, Seal
from balatro_gym_tpu.oracle.scoring_oracle import score_env_oracle, score_sim_oracle
from balatro_gym_tpu.ops.scoring import score_env_unified, score_sim

# Deterministic joker pool: excludes Misprint(27) and Bloodstone(117).
JOKER_POOL = [0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
              22, 23, 31, 33, 34, 38, 39, 40, 41, 48, 50, 53, 61, 72, 97,
              101, 104, 108, 116, 118, 119, 122, 124, 128, 131, 132, 133,
              134, 135, 136, 140, 147]
# Enhancements: exclude LUCKY (stochastic money).
ENH_POOL = [0, 0, 0, int(Enhancement.BONUS), int(Enhancement.MULT),
            int(Enhancement.GLASS), int(Enhancement.STEEL),
            int(Enhancement.STONE), int(Enhancement.GOLD)]
ED_POOL = [0, 0, int(Edition.FOIL), int(Edition.HOLOGRAPHIC),
           int(Edition.POLYCHROME)]
SEAL_POOL = [0, 0, int(Seal.GOLD), int(Seal.RED)]

N = 8


def random_case(rng):
    n = int(rng.integers(1, 6))
    ranks = rng.integers(2, 15, size=n)
    suits = rng.integers(0, 4, size=n)
    enh = rng.choice(ENH_POOL, size=n)
    ed = rng.choice(ED_POOL, size=n)
    seal = rng.choice(SEAL_POOL, size=n)
    jokers = rng.choice(JOKER_POOL, size=5, replace=False)
    hands_left = int(rng.integers(1, 5))
    discards_left = int(rng.integers(0, 4))
    deck = int(rng.integers(30, 53))
    return (list(zip(ranks.tolist(), suits.tolist())), enh.tolist(),
            ed.tolist(), seal.tolist(), jokers.tolist(), hands_left,
            discards_left, deck)


def to_arrays(cards, enh, ed, seal):
    ranks = np.zeros(N, np.int32)
    suits = np.zeros(N, np.int32)
    e = np.zeros(N, np.int32)
    d = np.zeros(N, np.int32)
    s = np.zeros(N, np.int32)
    valid = np.zeros(N, bool)
    for i, (r, su) in enumerate(cards):
        ranks[i], suits[i], valid[i] = r, su, True
        e[i], d[i], s[i] = enh[i], ed[i], seal[i]
    return map(jnp.asarray, (ranks, suits, valid, e, d, s))


def test_sim_pipeline_matches_oracle():
    rng = np.random.default_rng(0)
    f = jax.jit(score_sim)
    from balatro_gym_tpu.core.cards import RANK_CHIPS

    mismatches = []
    for case in range(150):
        cards, enh, ed, seal, jokers, hl, dl, deck = random_case(rng)
        ranks, suits, valid, e, d, s = to_arrays(cards, enh, ed, seal)
        got_score, got_money, got_ht, _ = f(
            ranks, suits, valid, e, d, s, RANK_CHIPS[ranks],
            jnp.asarray(jokers, jnp.int32), jnp.int32(hl), jnp.int32(dl),
            jnp.int32(deck), jax.random.key(case))
        want_score, want_money, want_ht = score_sim_oracle(
            cards, enh, ed, seal, jokers, hl, dl, deck)
        if (int(got_score), int(got_money), int(got_ht)) != \
                (want_score, want_money, want_ht):
            mismatches.append((case, cards, jokers,
                               (int(got_score), int(got_money), int(got_ht)),
                               (want_score, want_money, want_ht)))
    assert not mismatches, mismatches[:3]


def test_env_pipeline_matches_oracle():
    rng = np.random.default_rng(1)
    f = jax.jit(score_env_unified)
    mismatches = []
    for case in range(150):
        cards, enh, ed, seal, jokers, hl, dl, _ = random_case(rng)
        levels = rng.integers(1, 6, size=12).tolist()
        ranks, suits, valid, e, d, s = to_arrays(cards, enh, ed, seal)
        got_score, got_ht = f(
            ranks, suits, valid, e, d, jnp.asarray(levels, jnp.int32),
            jnp.asarray(jokers, jnp.int32), jnp.int32(hl), jnp.int32(dl),
            jnp.int32(52), jax.random.key(case))
        want_score, want_ht = score_env_oracle(
            cards, enh, ed, levels, jokers, hl, dl)
        if (int(got_score), int(got_ht)) != (want_score, want_ht):
            mismatches.append((case, cards, jokers, levels,
                               (int(got_score), int(got_ht)),
                               (want_score, want_ht)))
    assert not mismatches, mismatches[:3]
