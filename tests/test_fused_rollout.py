"""Fused whole-rollout Pallas kernel vs the jnp sim engine (bit-exact).

The kernel (ops/fused_rollout.py) replays fed action scripts in interpret
mode on CPU; every final-state field must equal the jnp engine's
(engine/sim_env.py) exactly — including across auto-reset boundaries.
Rewards compare with a small tolerance (the kernel accumulates in f32; the
x64 oracle in f64).

All six joker coefficient suites run in ONE kernel invocation via per-env
jokers (interpret-mode execution is ~8 s/step, so one 10-step rollout
covers everything a per-suite parametrization would at 1/6 the wall time).
"""
import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.engine import sim_env
from balatro_gym_tpu.ops.fused_rollout import TILE, rollout_fused

B = TILE
N_STEPS = 10

JOKER_SETS = (
    (0, 0, 0, 0, 0),        # none
    (1, 31, 34, 48, 72),    # bench: Joker/Fibonacci/Abstract/Blackboard/Baron
    (6, 7, 131, 135, 0),    # hand types: Jolly/Zany/The Duo/The Tribe
    (18, 69, 16, 23, 108),  # mods: Four Fingers/Shortcut/Half/Mystic/Acrobat
    (116, 118, 119, 2, 3),  # suits: Rough Gem/Arrowhead/Onyx Agate/Greedy/Lusty
    (147, 140, 128, 122, 61),  # royals: Triboulet/ShootMoon/SeeingDbl/Flower/Cavendish
)


def _jnp_replay(jok_b5, acts):
    """Replay actions through the jnp engine; return (final states, totals,
    episode counts)."""
    keys = jax.random.split(jax.random.key(0), B)
    st = jax.vmap(sim_env.reset)(keys, jnp.asarray(jok_b5))
    step_v = jax.jit(jax.vmap(sim_env.step_autoreset))
    tot = np.zeros(B)
    eps = np.zeros(B, np.int32)
    for t in range(acts.shape[0]):
        st, rew, done = step_v(st, jnp.asarray(acts[t]))
        tot += np.asarray(rew)
        eps += np.asarray(done)
    return st, tot, eps


def test_fused_matches_jnp_engine_bit_exact():
    """Mixed per-env joker suites + mask-driven legal actions (plays AND
    discards, across auto-resets): every state field bit-equal."""
    rng = np.random.default_rng(11)
    sets = np.asarray(JOKER_SETS, np.int32)
    jok_b5 = sets[np.arange(B) % len(sets)]

    # Legal action scripts generated against the jnp engine's mask.
    keys = jax.random.split(jax.random.key(0), B)
    st = jax.vmap(sim_env.reset)(keys, jnp.asarray(jok_b5))
    step_v = jax.jit(jax.vmap(sim_env.step_autoreset))
    mask_v = jax.jit(jax.vmap(sim_env.action_mask))
    acts = np.zeros((N_STEPS, B), np.int32)
    for t in range(N_STEPS):
        mask = np.asarray(mask_v(st))
        cum = np.cumsum(mask, axis=1)
        u = rng.random((B, 1))
        acts[t] = np.argmax(cum > u * cum[:, -1:], axis=1)
        st, _, _ = step_v(st, jnp.asarray(acts[t]))

    out = rollout_fused(0, B, N_STEPS, jok_b5, actions=acts, interpret=True)
    ref, tot, eps = _jnp_replay(jok_b5, acts)

    np.testing.assert_array_equal(np.asarray(out["hand_rank"]),
                                  np.asarray(ref.hand_rank), err_msg="hand_rank")
    np.testing.assert_array_equal(np.asarray(out["hand_suit"]),
                                  np.asarray(ref.hand_suit), err_msg="hand_suit")
    for field in ("deck_n", "money", "hands_left", "discards_left", "score"):
        np.testing.assert_array_equal(
            np.asarray(out[field]), np.asarray(getattr(ref, field)),
            err_msg=field)
    np.testing.assert_array_equal(np.asarray(out["episodes"]), eps)
    np.testing.assert_allclose(np.asarray(out["total_reward"]), tot, atol=2e-3)


def test_sharded_matches_single():
    """The mesh-sharded fused rollout (parallel/mesh.py) with fed actions is
    bit-identical to the single-device kernel — each virtual CPU device
    runs the kernel on its env shard (2-device mesh keeps interpret-mode
    wall time down; the mapping is device-count-agnostic)."""
    from jax.sharding import Mesh

    from balatro_gym_tpu.parallel import mesh as M

    mesh = Mesh(np.asarray(jax.devices()[:2]), (M.DATA_AXIS,))
    n_envs = 2 * TILE  # one tile per device
    sets = np.asarray(JOKER_SETS, np.int32)
    jok = sets[np.arange(n_envs) % len(sets)]
    rng = np.random.default_rng(5)
    acts = rng.integers(0, 5, (4, n_envs)).astype(np.int32)

    sharded = M.rollout_fused_sharded(0, n_envs, 4, jok, mesh=mesh,
                                      actions=acts, interpret=True)
    single = rollout_fused(0, n_envs, 4, jok, actions=acts, interpret=True)
    for k in ("hand_rank", "hand_suit", "score", "money", "episodes"):
        np.testing.assert_array_equal(np.asarray(sharded[k]),
                                      np.asarray(single[k]), err_msg=k)
