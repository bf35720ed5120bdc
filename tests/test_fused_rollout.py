"""Fused whole-rollout Pallas kernel vs the jnp sim engine (bit-exact).

The kernel (ops/fused_rollout.py) replays fed action scripts in interpret
mode on CPU; every final-state field must equal the jnp engine's
(engine/sim_env.py) exactly — including across auto-reset boundaries — for a
spread of joker sets exercising each coefficient path. Rewards compare with
a small tolerance (the kernel accumulates in f32; the x64 oracle in f64).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balatro_gym_tpu.engine import sim_env
from balatro_gym_tpu.ops.fused_rollout import TILE, rollout_fused

B = TILE
N_STEPS = 10

JOKER_SETS = {
    "none": (0, 0, 0, 0, 0),
    "bench": (1, 31, 34, 48, 72),            # Joker/Fibonacci/Abstract/Blackboard/Baron
    "hand_types": (6, 7, 131, 135, 0),        # Jolly/Zany/The Duo/The Tribe
    "mods": (18, 69, 16, 23, 108),            # Four Fingers/Shortcut/Half/Mystic/Acrobat
    "suits": (116, 118, 119, 2, 3),           # Rough Gem/Arrowhead/Onyx Agate/Greedy/Lusty
    "royals": (147, 140, 128, 122, 61),       # Triboulet/Shoot Moon/Seeing Dbl/Flower/Cavendish
}


def legal_action_scripts(jokers, n_steps, seed):
    """Roll the jnp engine with per-step random LEGAL actions; record them."""
    rng = np.random.default_rng(seed)
    keys = jax.random.split(jax.random.key(0), B)
    jok = jnp.broadcast_to(jnp.asarray(jokers, jnp.int32), (B, 5))
    st = jax.vmap(sim_env.reset)(keys, jok)
    step_v = jax.jit(jax.vmap(sim_env.step_autoreset))
    mask_v = jax.jit(jax.vmap(sim_env.action_mask))

    acts = np.zeros((n_steps, B), np.int32)
    tot = np.zeros(B)
    for t in range(n_steps):
        mask = np.asarray(mask_v(st))
        u = rng.random((B, 1))
        # Inverse-CDF draw over the legal set of each env.
        cum = np.cumsum(mask, axis=1)
        n_legal = cum[:, -1:]
        acts[t] = np.argmax(cum > u * n_legal, axis=1)
        st, rew, done = step_v(st, jnp.asarray(acts[t]))
        tot += np.asarray(rew)
    return acts, st, tot


@pytest.mark.parametrize("name", sorted(JOKER_SETS))
def test_fused_matches_jnp_engine(name):
    jokers = JOKER_SETS[name]
    acts, st, tot = legal_action_scripts(jokers, N_STEPS, seed=hash(name) % 2**31)
    out = rollout_fused(0, B, N_STEPS, jokers, actions=acts, interpret=True)

    np.testing.assert_array_equal(np.asarray(out["hand_rank"]),
                                  np.asarray(st.hand_rank), err_msg="hand_rank")
    np.testing.assert_array_equal(np.asarray(out["hand_suit"]),
                                  np.asarray(st.hand_suit), err_msg="hand_suit")
    for field in ("deck_n", "money", "hands_left", "discards_left", "score"):
        np.testing.assert_array_equal(
            np.asarray(out[field]), np.asarray(getattr(st, field)),
            err_msg=field)
    np.testing.assert_allclose(np.asarray(out["total_reward"]), tot,
                               atol=2e-3, err_msg="total_reward")


def test_fused_episode_accounting():
    """Plays-only scripts: episodes = dones counted by the jnp engine."""
    acts = np.full((N_STEPS, B), 4, np.int32)  # always play first 5 cards
    jokers = JOKER_SETS["bench"]
    out = rollout_fused(0, B, N_STEPS, jokers, actions=acts, interpret=True)

    keys = jax.random.split(jax.random.key(0), B)
    jok = jnp.broadcast_to(jnp.asarray(jokers, jnp.int32), (B, 5))
    st = jax.vmap(sim_env.reset)(keys, jok)
    eps = np.zeros(B, np.int32)
    step_v = jax.jit(jax.vmap(sim_env.step_autoreset))
    for t in range(N_STEPS):
        st, _, done = step_v(st, jnp.asarray(acts[t]))
        eps += np.asarray(done)
    np.testing.assert_array_equal(np.asarray(out["episodes"]), eps)


def test_fused_per_env_jokers():
    """jokers may differ per env ([B, 5] array)."""
    rng = np.random.default_rng(3)
    sets = np.asarray([JOKER_SETS[k] for k in sorted(JOKER_SETS)], np.int32)
    jok_b5 = sets[rng.integers(0, len(sets), B)]
    acts = rng.integers(0, 5, (N_STEPS, B)).astype(np.int32)

    out = rollout_fused(0, B, N_STEPS, jok_b5, actions=acts, interpret=True)

    keys = jax.random.split(jax.random.key(0), B)
    st = jax.vmap(sim_env.reset)(keys, jnp.asarray(jok_b5))
    step_v = jax.jit(jax.vmap(sim_env.step_autoreset))
    for t in range(N_STEPS):
        st, _, _ = step_v(st, jnp.asarray(acts[t]))
    np.testing.assert_array_equal(np.asarray(out["score"]), np.asarray(st.score))
    np.testing.assert_array_equal(np.asarray(out["hand_rank"]),
                                  np.asarray(st.hand_rank))
