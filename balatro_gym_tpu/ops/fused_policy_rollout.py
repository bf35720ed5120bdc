"""Policy-driven fused collection for the flagship env (PPO at kernel speed).

The PPO learner's env-side collection (train/ppo.py `_rollout`) was the last
jnp-engine consumer on the hot path: ~1.2M env-steps/s of ~2000 tiny
HBM-bound XLA ops per step, while the fused whole-rollout kernel
(ops/fused_full_rollout.py) steps the same env at ~80M. The whole-rollout
kernel can't serve PPO directly because actions must come from the learner's
policy network each step.

This module closes the gap with a SINGLE-STEP variant of the proven kernel
that additionally emits the policy inputs for the *next* step:

* ``step_tiles`` — one ``pallas_call`` stepping every env once
  (``fused_full_rollout._step`` verbatim: exact named-stream RNG, all
  bug-faithful quirks, autoreset) and writing, besides the packed state,
  the post-step observation block ([OBS_DIM rows] f32, mirroring
  ``full_env.observe_vector``) and legal-action mask block ([60 rows],
  mirroring ``full_env.action_mask``).
* ``observe_tiles`` — obs/mask of a state without stepping (rollout step 0).
* ``policy_apply_fm`` — the ActorCritic MLP applied FEATURE-MAJOR
  (activations ``[features, envs]``): envs stay on the 8x128 vector lanes
  end-to-end, so the scan body is [kernel step] -> [MXU matmuls] ->
  [categorical over axis 0] with zero per-step transposes or host syncs.

PPO collection is then ``lax.scan`` over (policy -> step_tiles): one fused
XLA program per rollout (train/ppo.py ``fused_rollout=True``).

Validation: the obs/mask row functions are bit-exact against
``vmap(observe_vector)`` / ``vmap(action_mask)`` (tests/
test_fused_policy_rollout.py, in-suite); the step consistency rides on the
whole-rollout kernel's proof (tests/test_fused_full_rollout.py) since
``_step``/``_load_state``/``_store_rows`` are imported, not reimplemented;
the real pallas_call is validated on TPU by
scripts/validate_policy_collect_tpu.py (state/reward bit-exact vs the
plain-XLA mirror, obs allclose — Mosaic transcendentals may differ in ulps).

Reference: this accelerates what the reference does with SB3's
``collect_rollouts`` over SubprocVecEnv workers
(train_balatro_agent.py:269-461) — policy inference and env stepping
interleaved per step — as one compiled TPU program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from balatro_gym_tpu.core.constants import Action, Phase
from balatro_gym_tpu.ops.fused_full_rollout import (
    LANES,
    N_CONS,
    N_DECK,
    N_HAND,
    N_JOK,
    N_LVL,
    N_SHOP,
    NI,
    NR,
    SUB,
    TILE,
    _load_state,
    _pow_tables_cached,
    _Rng,
    _step,
    _store_rows,
    f32,
    i32,
    pack_full_state,
    u32,
    unpack_full_state,
)

OBS_DIM = 8 * 17 + N_JOK + N_LVL + N_SHOP * 2 + 4 + 12  # = full_env.OBS_VEC_DIM
N_ACTIONS = 60

N_CARD_ROWS = 6 * N_DECK


# ---------------------------------------------------------------------------
# Observation / mask rows (mirrors of full_env.observe_vector / action_mask)
# ---------------------------------------------------------------------------


def _obs_rows(s):
    """[OBS_DIM] list of (SUB, LANES) f32 rows == observe_vector(st)[:, d]
    per env. Field order and arithmetic mirror full_env.observe_vector
    exactly (same casts, same divisions) so the rows are bit-identical to
    the jnp engine's obs under the f32 production config."""
    rows = []
    # cards: per hand position p, 13 rank one-hots (ranks 2..14) then 4 suit
    # one-hots, gated by present (full_env._hand_card_view semantics).
    for p in range(N_HAND):
        present = (jnp.full((SUB, LANES), p, i32) < s["hn"]) & (s["hidx"][p] >= 0)
        for r in range(2, 15):
            rows.append(((s["hrk"][p] == r) & present).astype(f32))
        for su in range(4):
            rows.append(((s["hsu"][p] == su) & present).astype(f32))
    for j in range(N_JOK):
        rows.append(s["jok"][j].astype(f32) / 150.0)
    for h in range(N_LVL):
        rows.append(s["lvl"][h].astype(f32) / 15.0)
    for r in range(N_SHOP):
        rows.append(s["sty"][r].astype(f32) / 4.0)
    for r in range(N_SHOP):
        rows.append(jnp.minimum(1.0, s["sco"][r].astype(f32) / 1000.0))
    for ph in range(4):
        rows.append((s["phase"] == ph).astype(f32))
    any_sel = jnp.zeros((SUB, LANES), bool)
    for p in range(N_HAND):
        any_sel = any_sel | s["sel"][p]
    cn = jnp.maximum(1, s["need"]).astype(f32)
    rows.append(s["money"].astype(f32) / 20.0)
    rows.append(s["ante"].astype(f32) / 8.0)
    rows.append(s["round"].astype(f32) / 3.0)
    rows.append(s["hl"].astype(f32) / 4.0)
    rows.append(s["dl"].astype(f32) / 3.0)
    rows.append(jnp.minimum(2.0, s["rchips"].astype(f32) / cn))
    rows.append(jnp.log1p(s["need"].astype(f32)) / 10.0)
    rows.append(s["jn"].astype(f32) / 5.0)
    rows.append(s["cn"].astype(f32) / 2.0)
    rows.append(s["bact"].astype(f32))
    rows.append(jnp.where(s["bact"], s["bid"], 0).astype(f32) / 28.0)
    rows.append(any_sel.astype(f32))
    assert len(rows) == OBS_DIM
    return rows


def _mask_rows(s):
    """[60] list of (SUB, LANES) bool rows == action_mask(st)[:, a] per env
    (full_env.action_mask, balatro_env_2.py:1426-1471 semantics)."""
    false = jnp.zeros((SUB, LANES), bool)
    in_play = s["phase"] == int(Phase.PLAY)
    in_shop = s["phase"] == int(Phase.SHOP)
    in_blind = s["phase"] == int(Phase.BLIND_SELECT)
    any_sel = jnp.zeros((SUB, LANES), bool)
    for p in range(N_HAND):
        any_sel = any_sel | s["sel"][p]
    n_selectable = jnp.minimum(N_HAND, s["hn"])

    rows = [false] * N_ACTIONS
    rows[int(Action.PLAY_HAND)] = in_play & any_sel
    rows[int(Action.DISCARD)] = in_play & any_sel & (s["dl"] > 0)
    for p in range(N_HAND):
        rows[int(Action.SELECT_CARD_BASE) + p] = in_play & (p < n_selectable)
    for c in range(N_CONS):
        rows[int(Action.USE_CONSUMABLE_BASE) + c] = in_play & (c < s["cn"])
    for r in range(N_SHOP):
        rows[int(Action.SHOP_BUY_BASE) + r] = (
            in_shop & (r < s["sn"]) & (s["money"] >= s["sco"][r]))
    rows[int(Action.SHOP_REROLL)] = in_shop & (s["money"] >= s["rcost"])
    rows[int(Action.SHOP_END)] = in_shop
    for j in range(N_JOK):
        rows[int(Action.SELL_JOKER_BASE) + j] = in_shop & (j < s["jn"])
    for b in range(3):
        rows[int(Action.SELECT_BLIND_BASE) + b] = in_blind
    rows[int(Action.SKIP_BLIND)] = in_blind
    not_done = ~s["done"]
    return [r & not_done for r in rows]


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _emit(ref, rows):
    for r, v in enumerate(rows):
        ref[r, 0] = v


def _kernel_step(cards_ref, ints_ref, rng_ref, act_ref,
                 cards_out, ints_out, rng_out, rew_out, done_out,
                 obs_out, mask_out, *, pow115, pow15):
    rng = _Rng(True)  # exact named-stream RNG (actions are always fed)
    s = _load_state(cards_ref, ints_ref, rng_ref)
    s, reward, done = _step(s, act_ref[0, 0], rng, pow115, pow15)
    cr, ir, rr = _store_rows(s)
    _emit(cards_out, cr)
    _emit(ints_out, ir)
    _emit(rng_out, rr)
    rew_out[0, 0] = reward
    done_out[0, 0] = done.astype(i32)
    _emit(obs_out, _obs_rows(s))
    _emit(mask_out, [m.astype(i32) for m in _mask_rows(s)])


def _kernel_observe(cards_ref, ints_ref, rng_ref, obs_out, mask_out):
    s = _load_state(cards_ref, ints_ref, rng_ref)
    _emit(obs_out, _obs_rows(s))
    _emit(mask_out, [m.astype(i32) for m in _mask_rows(s)])


def _blk(rows):
    return pl.BlockSpec((rows, 1, SUB, LANES), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)


_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("interpret",))
def step_tiles(cards, ints, rng, actions, interpret: bool = False):
    """One env step for every lane. All operands tiled
    [rows, n_tiles, SUB, LANES]; ``actions`` [1, n_tiles, SUB, LANES] i32.

    Returns (cards', ints', rng', reward [1,...] f32, done [1,...] i32,
    obs [OBS_DIM,...] f32, mask [60,...] i32) — obs/mask of the POST-step
    (post-autoreset) state, i.e. the next policy input.
    """
    n_tiles = ints.shape[1]
    pow115, pow15 = _pow_tables_cached()
    return pl.pallas_call(
        functools.partial(_kernel_step, pow115=tuple(pow115),
                          pow15=tuple(pow15)),
        grid=(n_tiles,),
        in_specs=[_blk(N_CARD_ROWS), _blk(NI), _blk(NR), _blk(1)],
        out_specs=(_blk(N_CARD_ROWS), _blk(NI), _blk(NR), _blk(1), _blk(1),
                   _blk(OBS_DIM), _blk(N_ACTIONS)),
        out_shape=(
            jax.ShapeDtypeStruct((N_CARD_ROWS, n_tiles, SUB, LANES), i32),
            jax.ShapeDtypeStruct((NI, n_tiles, SUB, LANES), i32),
            jax.ShapeDtypeStruct((NR, n_tiles, SUB, LANES), u32),
            jax.ShapeDtypeStruct((1, n_tiles, SUB, LANES), f32),
            jax.ShapeDtypeStruct((1, n_tiles, SUB, LANES), i32),
            jax.ShapeDtypeStruct((OBS_DIM, n_tiles, SUB, LANES), f32),
            jax.ShapeDtypeStruct((N_ACTIONS, n_tiles, SUB, LANES), i32),
        ),
        compiler_params=_VMEM,
        interpret=interpret,
    )(cards, ints, rng, actions)


@functools.partial(jax.jit, static_argnames=("interpret",))
def observe_tiles(cards, ints, rng, interpret: bool = False):
    """obs/mask of the CURRENT state (rollout step 0), tiled operands."""
    n_tiles = ints.shape[1]
    return pl.pallas_call(
        _kernel_observe,
        grid=(n_tiles,),
        in_specs=[_blk(N_CARD_ROWS), _blk(NI), _blk(NR)],
        out_specs=(_blk(OBS_DIM), _blk(N_ACTIONS)),
        out_shape=(
            jax.ShapeDtypeStruct((OBS_DIM, n_tiles, SUB, LANES), f32),
            jax.ShapeDtypeStruct((N_ACTIONS, n_tiles, SUB, LANES), i32),
        ),
        compiler_params=_VMEM,
        interpret=interpret,
    )(cards, ints, rng)


# --- plain-XLA mirrors (the kernels' exact arithmetic, no Mosaic) ----------
# Used for CPU validation (run them under jax.disable_jit(): XLA:CPU's
# compile of the step body is pathological — see validate_fused_full_cpu.py)
# and for TPU cross-checking of the pallas path.


def step_tiles_rows(cards, ints, rng, actions):
    pow115, pow15 = _pow_tables_cached()
    n_tiles = ints.shape[1]
    outs = [[] for _ in range(7)]
    for tix in range(n_tiles):
        sl = slice(tix, tix + 1)
        rngx = _Rng(True)
        s = _load_state(cards[:, sl], ints[:, sl], rng[:, sl])
        s, reward, done = _step(s, actions[0, tix], rngx,
                                tuple(pow115), tuple(pow15))
        cr, ir, rr = _store_rows(s)
        for k, rows in enumerate((cr, ir, rr, [reward],
                                  [done.astype(i32)], _obs_rows(s),
                                  [m.astype(i32) for m in _mask_rows(s)])):
            outs[k].append(jnp.stack(rows)[:, None])
    return tuple(jnp.concatenate(o, axis=1) for o in outs)


def observe_tiles_rows(cards, ints, rng):
    n_tiles = ints.shape[1]
    obs, mask = [], []
    for tix in range(n_tiles):
        sl = slice(tix, tix + 1)
        s = _load_state(cards[:, sl], ints[:, sl], rng[:, sl])
        obs.append(jnp.stack(_obs_rows(s))[:, None])
        mask.append(jnp.stack([m.astype(i32) for m in _mask_rows(s)])[:, None])
    return jnp.concatenate(obs, axis=1), jnp.concatenate(mask, axis=1)


# ---------------------------------------------------------------------------
# Tiling helpers (host <-> kernel layout)
# ---------------------------------------------------------------------------


def tile_packed(packed):
    """pack_full_state output -> (cards, ints, rng) tiled
    [rows, n_tiles, SUB, LANES]. Env e of tile t sits at
    (t, e // LANES, e % LANES) — the whole-rollout kernel's layout."""
    n_envs = packed["ints"].shape[-1]
    assert n_envs % TILE == 0, f"n_envs={n_envs} must be a multiple of {TILE}"
    n_tiles = n_envs // TILE

    def t(x, rows):
        return x.reshape(rows, n_tiles, SUB, LANES)

    return (t(packed["cards"].reshape(N_CARD_ROWS, n_envs), N_CARD_ROWS),
            t(packed["ints"], NI), t(packed["rng"], NR))


def untile_packed(cards, ints, rng):
    """Inverse of tile_packed, back to the pack_full_state dict."""
    n_envs = ints.shape[1] * TILE
    return {"cards": cards.reshape(6, N_DECK, n_envs),
            "ints": ints.reshape(NI, n_envs),
            "rng": rng.reshape(NR, n_envs)}


def flat_fm(x):
    """[rows, n_tiles, SUB, LANES] -> feature-major [rows, n_envs]."""
    return x.reshape(x.shape[0], -1)


def unflat_fm(x, n_tiles):
    """[rows, n_envs] -> [rows, n_tiles, SUB, LANES]."""
    return x.reshape(x.shape[0], n_tiles, SUB, LANES)


# ---------------------------------------------------------------------------
# Feature-major policy apply (ActorCritic params, envs on lanes)
# ---------------------------------------------------------------------------


def policy_apply_fm(params, obs_fm, mask_fm, compute_dtype=None):
    """ActorCritic forward with activations [features, envs].

    Numerically equivalent to ``ActorCritic.apply(params, obs.T, mask.T)``
    at the SAME ``compute_dtype`` (same weights, transposed contraction —
    results match to matmul reduction-order tolerance, not bit-exactly;
    tests assert <=1e-5 for f32). With ``compute_dtype=bfloat16`` the cast
    structure mirrors flax ``Dense(dtype=bf16)`` exactly — bf16 bias add,
    bf16 activations into tanh, heads cast to f32 after the bias — so the
    learner's recomputed log-probs/values under ``PPOConfig.bf16_compute``
    agree with the stored collection values up to matmul-order noise
    (epoch-0 importance ratios ~1), not a structural precision mismatch.

    params: the flax param dict from ``ActorCritic.init``.
    obs_fm: [D, E] f32.  mask_fm: [A, E] bool.
    Returns (masked logits [A, E] f32, value [E] f32).
    """
    dense = params["params"]
    assert all(n.startswith("Dense_") for n in dense), (
        "policy_apply_fm mirrors ActorCritic's all-Dense stack; a non-Dense "
        f"layer would mis-bind weights silently: {sorted(dense)}")
    names = sorted(dense, key=lambda n: int(n.split("_")[1]))
    hidden, logits_name, value_name = names[:-2], names[-2], names[-1]
    # Head-binding guards: the inferred logits/value kernels must have the
    # action-count / scalar out-dims, or a reordered module fails loudly.
    assert dense[logits_name]["kernel"].shape[1] == mask_fm.shape[0], (
        dense[logits_name]["kernel"].shape, mask_fm.shape)
    assert dense[value_name]["kernel"].shape[1] == 1, (
        dense[value_name]["kernel"].shape)
    dt = compute_dtype

    def dot(w, x):
        # f32 MXU accumulation; under dt=bf16 the result is cast to bf16,
        # matching flax Dense(dtype=bf16)'s bf16 output of the same product.
        y = jax.lax.dot_general(w, x, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
        return y.astype(dt) if dt is not None else y

    x = obs_fm if dt is None else obs_fm.astype(dt)
    for name in hidden:
        w, b = dense[name]["kernel"], dense[name]["bias"]
        if dt is not None:
            w, b = w.astype(dt), b.astype(dt)
        x = jnp.tanh(dot(w, x) + b[:, None])
    wl, bl = dense[logits_name]["kernel"], dense[logits_name]["bias"]
    wv, bv = dense[value_name]["kernel"], dense[value_name]["bias"]
    if dt is not None:
        wl, bl = wl.astype(dt), bl.astype(dt)
        wv, bv = wv.astype(dt), bv.astype(dt)
    logits = (dot(wl, x) + bl[:, None]).astype(f32)
    logits = jnp.where(mask_fm, logits, -1e9)
    value = (dot(wv, x) + bv[:, None])[0].astype(f32)
    return logits, value


def policy_apply_structured_fm(params, obs_fm, mask_fm, compute_dtype=None,
                               hand_dim=8 * 17, joker_dim=5):
    """``StructuredActorCritic`` forward with activations [features, envs]
    (round-4 verdict item 5: the reference-faithful 3-branch extractor on
    the fast collection path).

    Branches are all Dense, so each gets the same MXU-transposed treatment
    as :func:`policy_apply_fm`; the branch outputs concatenate on the
    FEATURE axis (rows), which is free in this layout. Layer binding
    follows flax nn.compact call order (networks.StructuredActorCritic):
    Dense_0/1 hand branch, Dense_2/3 joker branch, Dense_4/5 game-state
    branch, Dense_6/7 trunk, Dense_8 logits, Dense_9 value — each binding
    is shape-asserted so a reordered module fails loudly.
    """
    dense = params["params"]
    assert all(n.startswith("Dense_") for n in dense), sorted(dense)
    names = sorted(dense, key=lambda n: int(n.split("_")[1]))
    assert len(names) == 10, names
    D, A = obs_fm.shape[0], mask_fm.shape[0]
    rest_dim = D - hand_dim - joker_dim
    assert dense["Dense_0"]["kernel"].shape[0] == hand_dim
    assert dense["Dense_2"]["kernel"].shape[0] == joker_dim
    assert dense["Dense_4"]["kernel"].shape[0] == rest_dim
    assert dense["Dense_8"]["kernel"].shape[1] == A
    assert dense["Dense_9"]["kernel"].shape[1] == 1
    dt = compute_dtype

    def dot(w, x):
        y = jax.lax.dot_general(w, x, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
        return y.astype(dt) if dt is not None else y

    def layer(name, x):
        w, b = dense[name]["kernel"], dense[name]["bias"]
        if dt is not None:
            w, b = w.astype(dt), b.astype(dt)
        return dot(w, x) + b[:, None]

    x = obs_fm if dt is None else obs_fm.astype(dt)
    h = x[:hand_dim]
    j = x[hand_dim:hand_dim + joker_dim]
    g = x[hand_dim + joker_dim:]
    for name in ("Dense_0", "Dense_1"):
        h = jax.nn.relu(layer(name, h))
    for name in ("Dense_2", "Dense_3"):
        j = jax.nn.relu(layer(name, j))
    for name in ("Dense_4", "Dense_5"):
        g = jax.nn.relu(layer(name, g))
    z = jnp.concatenate([h, j, g], axis=0)
    for name in ("Dense_6", "Dense_7"):
        z = jax.nn.relu(layer(name, z))
    logits = layer("Dense_8", z).astype(f32)
    logits = jnp.where(mask_fm, logits, -1e9)
    value = layer("Dense_9", z)[0].astype(f32)
    return logits, value


def sample_fm(key, logits_fm):
    """Categorical sample + log-prob, feature-major. Returns
    (action [E] i32, log_prob [E] f32)."""
    action = jax.random.categorical(key, logits_fm, axis=0)
    log_all = jax.nn.log_softmax(logits_fm, axis=0)
    log_prob = jnp.take_along_axis(log_all, action[None, :], axis=0)[0]
    return action.astype(jnp.int32), log_prob


# ---------------------------------------------------------------------------
# Standalone collection (bench / validation; PPO wires its own scan)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_steps",))
def _collect(params, cards, ints, rng, obs, mask, key, n_steps: int):
    n_tiles = ints.shape[1]

    def body(carry, k):
        cards, ints, rng, obs, mask = carry
        logits, value = policy_apply_fm(params, flat_fm(obs),
                                        flat_fm(mask) != 0)
        action, log_prob = sample_fm(k, logits)
        acts = unflat_fm(action[None, :], n_tiles)
        cards, ints, rng, reward, done, obs, mask = step_tiles(
            cards, ints, rng, acts)
        out = (action, log_prob, value, flat_fm(reward)[0],
               flat_fm(done)[0] != 0)
        return (cards, ints, rng, obs, mask), out

    carry, (a, lp, v, rew, done) = jax.lax.scan(
        body, (cards, ints, rng, obs, mask), jax.random.split(key, n_steps))
    return carry, {"action": a, "log_prob": lp, "value": v,
                   "reward": rew, "done": done}


def collect_policy_fused(params, init_state, key, n_steps: int):
    """Policy-in-the-loop fused rollout: scan of (feature-major MLP ->
    single-step kernel). ``init_state``: batched FullEnvState (n_envs a
    multiple of TILE). Returns (final FullEnvState, trajectory dict of
    [n_steps, n_envs] arrays)."""
    cards, ints, rng = tile_packed(pack_full_state(init_state))
    obs, mask = observe_tiles(cards, ints, rng)
    (cards, ints, rng, _, _), traj = _collect(
        params, cards, ints, rng, obs, mask, key, n_steps)
    final = unpack_full_state(untile_packed(cards, ints, rng))
    return final, traj
