"""Mechanics-only differential against the LIVE reference
``EightCardDrawEnv`` (env.py:108-246) — the round-4 verdict item 3 stretch.

Scores are EXCLUDED: the reference's treys path is broken (deleted
``Card.Ranks``/``BalatroGame._evaluate_hand`` API, env.py:85-93) so it runs
the hash fallback (env.py:98-100), which PARITY #B5 deliberately replaces
with the intended scorer. Everything else — dealing, the discard-mask
replacement semantics, phases, masks, one-hot obs, termination — is
compared exactly, step by step, by planting the live env's shuffled deck
into our explicit deck state (no seams needed: ECDState carries the deck).

Mechanics compared per step:
* obs key set + ``cards`` one-hot + ``phase`` (terminal mask skipped: ours
  zeroes the mask on done, the reference leaves its phase mask up — the
  terminal obs is discarded by Gym convention);
* the discard replacement rule ``hand[discards] = deck[8:8+n]`` — i.e. the
  i-th lowest discarded INDEX gets draw card i (env.py:196-202);
* phase-0 reward == 0.0 on both sides; done flags equal;
* stepping a terminated episode raises on both sides.
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

ref_mod = pytest.importorskip("balatro_gym.env")

from balatro_gym_tpu.envs import eight_card_draw as E  # noqa: E402

_observe_j = jax.jit(E.observe)
_step_j = jax.jit(E.step)


def compare(obs_r, obs_o, t, ctx, skip=()):
    assert set(obs_r) == set(obs_o), (set(obs_r), set(obs_o))
    for k in obs_r:
        if k in skip:
            continue
        np.testing.assert_array_equal(
            np.asarray(obs_o[k], np.int64), np.asarray(obs_r[k], np.int64),
            err_msg=f"step {t}: obs[{k}] {ctx}")


# Discard masks spanning the space: none, all, single bits, alternating,
# low/high halves, random-ish patterns.
DISCARD_ACTIONS = [0, 255, 1, 128, 0b10101010, 0b01010101, 0b00001111,
                   0b11110000, 7, 224, 36, 219]
SELECT_ACTIONS = [256, 311, 256 + 17, 256 + 28, 256 + 41, 256 + 55,
                  256 + 3, 256 + 50, 256 + 9, 256 + 33, 256 + 20, 256 + 47]


def test_8card_mechanics_differential_vs_live_reference():
    steps = 0
    for ep, (a0, a1) in enumerate(zip(DISCARD_ACTIONS, SELECT_ACTIONS)):
        seed = 40 + ep
        np.random.seed(seed)  # _deal_hand shuffles the GLOBAL np.random
        env = ref_mod.EightCardDrawEnv()
        obs_r, _ = env.reset(seed=seed)

        st = E.reset(jax.random.key(0)).replace(
            deck=jnp.asarray(env.deck, jnp.int32),
            hand=jnp.asarray(env.hand, jnp.int32))
        obs_o = {k: np.asarray(v) for k, v in _observe_j(st).items()}
        compare(obs_r, obs_o, -1, f"initial (seed {seed})")

        # phase 0: discard mask
        obs_r, r_r, term_r, _, _ = env.step(a0)
        st, r_o, done_o = _step_j(st, jnp.int32(a0))
        obs_o = {k: np.asarray(v) for k, v in _observe_j(st).items()}
        compare(obs_r, obs_o, 0, f"(discard {a0:#04x}, seed {seed})")
        assert float(r_r) == float(r_o) == 0.0
        assert bool(term_r) == bool(done_o) is False
        # the replacement rule, asserted directly against the live deck
        disc = [i for i in range(8) if (a0 >> i) & 1]
        for j, i in enumerate(disc):
            assert int(np.asarray(st.hand)[i]) == int(env.deck[8 + j])

        # phase 1: select-five (reward values excluded per #B5 — the
        # reference's is the hash fallback; ranges still sanity-checked)
        obs_r, r_r, term_r, _, _ = env.step(a1)
        st, r_o, done_o = _step_j(st, jnp.int32(a1))
        obs_o = {k: np.asarray(v) for k, v in _observe_j(st).items()}
        compare(obs_r, obs_o, 1, f"(select {a1}, seed {seed})",
                skip=("action_mask",))
        assert bool(term_r) and bool(done_o)
        assert 0.0 <= float(r_r) <= 1.0  # hash fallback range (env.py:100)
        assert float(r_o) >= 0.0         # intended scorer (#B5)

        # both sides refuse to step a terminated episode
        with pytest.raises(RuntimeError):
            env.step(a1)
        shell = E.EightCardDrawGymEnv(seed=seed)
        shell.reset()
        shell._st = st
        with pytest.raises(RuntimeError):
            shell.step(a1)
        steps += 2
    assert steps >= 24
