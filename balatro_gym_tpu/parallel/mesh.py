"""Multi-chip / multi-host data parallelism over a jax.sharding.Mesh.

The reference's only parallelism is OS-process SubprocVecEnv on one node
(reference: train_balatro_agent.py:313-316, train.sbatch:5-8 — 1 GPU, no
NCCL/MPI anywhere). The TPU-native mapping (SURVEY §2.7): envs are leaves of a
batched pytree SHARDED over the mesh's data axis, the PPO learner's params
are REPLICATED, and the only collectives are the gradient/metric
``pmean``/``psum`` inside the update — which XLA lowers onto ICI.

``shard_map`` (not pjit auto-sharding) is used for the train step so the
per-shard program is exactly the single-chip program: no accidental
cross-shard gathers from minibatch permutation; collectives appear only where
written. Minibatch shuffling is deliberately SHARD-LOCAL (each shard permutes
its own rollout) — a global shuffle would need an ``all_gather`` of the whole
batch per epoch; with i.i.d. env lanes the local shuffle is statistically
equivalent and keeps the only collectives the gradient/metric reductions.

Multi-host: call :func:`init_distributed` first (jax.distributed.initialize),
then build the mesh over ``jax.devices()`` — env shards then live host-local
and gradient reductions ride ICI within the slice / DCN across hosts exactly
as laid out by the device order.
"""
from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from balatro_gym_tpu.train.ppo import EnvHooks, PPOConfig, TrainState, make_ppo

DATA_AXIS = "dp"


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host bring-up (no-op on single host unless args given)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _train_state_specs(ts: TrainState, axis: str) -> TrainState:
    """PartitionSpec pytree: env batch sharded on the data axis, rest replicated."""
    return TrainState(
        params=jax.tree.map(lambda _: P(), ts.params),
        opt_state=jax.tree.map(lambda _: P(), ts.opt_state),
        env_states=jax.tree.map(lambda _: P(axis), ts.env_states),
        key=P(),
        update_idx=P(),
        # Normalization stats are pmean-merged inside the update, so they
        # stay replicated; the per-env return carry shards with the envs.
        obs_stats=jax.tree.map(lambda _: P(), ts.obs_stats),
        ret_stats=jax.tree.map(lambda _: P(), ts.ret_stats),
        ret_carry=P(axis),
    )


def make_distributed_ppo(hooks: EnvHooks, cfg: PPOConfig, mesh: Mesh,
                         axis: str = DATA_AXIS):
    """Build (init_fn, step_fn) for data-parallel PPO over ``mesh``.

    cfg.n_envs is the GLOBAL env count and must divide by the mesh size;
    each shard steps n_envs // size envs. init_fn returns a TrainState whose
    env leaves are already placed with the sharded layout; step_fn is the
    jitted shard_map'd update (params replicated in and out, verified by the
    pmean'd gradients).
    """
    size = mesh.devices.size
    if cfg.n_envs % size:
        raise ValueError(f"n_envs={cfg.n_envs} not divisible by mesh size {size}")
    init_fn, update_fn, policy_fn = make_ppo(hooks, cfg)

    # Spec trees are built from a throwaway abstract init so the shard_map
    # signature is known before any real state exists.
    abstract = jax.eval_shape(init_fn, jax.random.key(0))
    specs = _train_state_specs(abstract, axis)

    def sharded_init(key) -> TrainState:
        shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))
        # jit with out_shardings (NOT device_put): under multi-process
        # jax.distributed the mesh spans non-addressable devices, where
        # device_put is illegal but SPMD computation is exactly what we
        # want — every process runs the same init and keeps its shards.
        return jax.jit(init_fn, out_shardings=shardings)(key)
    metric_specs = {k: P() for k in
                    ("loss", "pg_loss", "vf_loss", "entropy", "mean_reward",
                     "episodes", "approx_kl", "kl_skipped")}

    step = jax.jit(
        jax.shard_map(
            functools.partial(update_fn, axis_name=axis),
            mesh=mesh,
            in_specs=(specs,),
            out_specs=(specs, metric_specs),
            check_vma=False,
        ),
        donate_argnums=(0,),
    )
    return sharded_init, step, policy_fn


def train_distributed(num_updates: int = 8, cfg: PPOConfig | None = None,
                      mesh: Mesh | None = None, seed: int = 0,
                      hooks: EnvHooks | None = None, log_every: int = 0):
    """Data-parallel training driver. Returns (TrainState, last metrics)."""
    from balatro_gym_tpu.train.ppo import sim_env_hooks

    cfg = cfg or PPOConfig()
    hooks = hooks or sim_env_hooks()
    mesh = mesh or make_mesh()
    init_fn, step_fn, _ = make_distributed_ppo(hooks, cfg, mesh)
    ts = init_fn(jax.random.key(seed))
    metrics = None
    for i in range(num_updates):
        ts, metrics = step_fn(ts)
        if log_every and (i + 1) % log_every == 0:
            print(f"update {i + 1}: " +
                  str({k: float(v) for k, v in metrics.items()}))
    return ts, metrics


def rollout_fused_sharded(seed, n_envs: int, n_steps: int, jokers,
                          mesh: Mesh | None = None, actions=None,
                          interpret: bool = False):
    """Data-parallel fused-kernel rollout (ops/fused_rollout.py) over the
    mesh's data axis: each device runs the whole-rollout Pallas kernel on its
    env shard; no collectives are needed (per-env outputs stay sharded).

    In sampling mode each shard offsets the seed by ``axis_index *
    n_local_tiles`` — the kernel seeds tile t of a shard with ``seed +
    program_id(t)`` (ops/fused_rollout.py), so striding by the local tile
    count gives every (shard, tile) pair a distinct hardware-PRNG stream.
    (Plain ``seed + axis_index`` would alias shard s tile t with shard s+1
    tile t-1 whenever a shard holds >1 tile.) Callers running several
    sampled rollouts should likewise space their base seeds by
    ``n_envs // fused_rollout.TILE``. In fed-actions mode results are
    bit-identical to the single-device kernel
    (tests/test_fused_rollout.py::test_sharded_matches_single).

    Returns the same dict as :func:`rollout_fused`, with [n_envs] leaves
    sharded over the mesh.
    """
    import jax.numpy as jnp

    from balatro_gym_tpu.ops.fused_rollout import TILE, rollout_fused

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    assert n_envs % n_dev == 0
    local = n_envs // n_dev
    n_local_tiles = max(1, local // TILE)

    jok = jnp.asarray(jokers, jnp.int32)
    if jok.ndim == 1:
        jok = jnp.broadcast_to(jok, (n_envs, jok.shape[0]))
    use_actions = actions is not None
    if use_actions:
        acts = jnp.asarray(actions, jnp.int32)
        if acts.ndim == 1:
            acts = jnp.broadcast_to(acts[:, None], (n_steps, n_envs))
    else:  # dummy; ignored by the kernel in sampling mode
        acts = jnp.zeros((n_steps, n_envs), jnp.int32)

    def shard_body(jok_l, acts_l):
        shard_seed = (jnp.asarray(seed, jnp.int32)
                      + jax.lax.axis_index(DATA_AXIS) * n_local_tiles)
        return rollout_fused(shard_seed, local, n_steps, jok_l,
                             actions=acts_l if use_actions else None,
                             interpret=interpret)

    out_spec = {k: P(DATA_AXIS) for k in
                ("hand_rank", "hand_suit", "deck_n", "money", "hands_left",
                 "discards_left", "score", "episodes", "total_reward")}
    return jax.jit(jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(None, DATA_AXIS)),
        out_specs=out_spec, check_vma=False,
    ))(jok, acts)


def rollout_full_sharded(seed, n_envs: int, n_steps: int,
                         mesh: Mesh | None = None, actions=None,
                         init_state=None, interpret: bool = False,
                         _rollout_fn=None):
    """Data-parallel FLAGSHIP fused rollout (ops/fused_full_rollout.py) over
    the mesh's data axis — the full-env twin of :func:`rollout_fused_sharded`.

    Each device runs the whole-rollout full-game Pallas kernel on its env
    shard; per-env outputs stay sharded, so no collectives are needed. The
    env→(tile, sublane, lane) layout is shard-local-contiguous: global env
    ``e`` lives on shard ``e // (n_envs // n_dev)``, and within the shard the
    kernel's own tiling applies — identical to slicing the single-device
    layout, so FED-ACTIONS mode is bit-identical to the single-device kernel
    (tests/test_full_sharded.py, the full-env twin of
    tests/test_fused_rollout.py::test_sharded_matches_single).

    In sampling mode shard seeds stride by ``axis_index * n_local_tiles``
    (same aliasing-free scheme as rollout_fused_sharded).

    Args mirror ``rollout_full_fused``; ``init_state`` is the GLOBAL batched
    FullEnvState (defaults to ``vmap(full_env.reset)`` over
    ``split(key(seed), n_envs)``) and is sharded over its env axis.
    Returns the same dict as ``rollout_full_fused`` with [n_envs] leaves
    sharded over the mesh.
    """
    import jax.numpy as jnp

    from balatro_gym_tpu.ops.fused_full_rollout import (
        TILE, _default_reset, _pow_tables_cached, rollout_full_fused)

    if _rollout_fn is None:
        _rollout_fn = rollout_full_fused
    # else: test seam — a stand-in with rollout_full_fused's signature lets
    # the wrapper's sharding/slicing/seed logic be proven bit-exactly on
    # CPU meshes without compiling the giant kernel body (XLA:CPU needs
    # ~an hour for the interpret-mode step body; tests/test_full_mesh.py).

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    assert n_envs % n_dev == 0
    local = n_envs // n_dev
    assert local % TILE == 0, \
        f"{local} envs/shard not a multiple of the kernel tile {TILE}"
    n_local_tiles = local // TILE
    _pow_tables_cached()  # mint the pow tables on the host, outside any trace

    use_actions = actions is not None
    if use_actions:
        acts = jnp.asarray(actions, jnp.int32)
        if acts.ndim == 1:
            acts = jnp.broadcast_to(acts[:, None], (n_steps, n_envs))
    else:  # dummy; ignored by the kernel in sampling mode
        acts = jnp.zeros((1, n_envs), jnp.int32)
    if init_state is None:
        init_state = _default_reset(seed, n_envs)

    def shard_body(st_l, acts_l):
        shard_seed = (jnp.asarray(seed, jnp.int32)
                      + jax.lax.axis_index(DATA_AXIS) * n_local_tiles)
        return _rollout_fn(
            shard_seed, local, n_steps,
            actions=acts_l if use_actions else None,
            init_state=st_l, interpret=interpret)

    state_specs = jax.tree.map(lambda _: P(DATA_AXIS), init_state)
    out_specs = {"state": state_specs, "total_reward": P(DATA_AXIS),
                 "episodes": P(DATA_AXIS)}
    return jax.jit(jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(state_specs, P(None, DATA_AXIS)),
        out_specs=out_specs, check_vma=False,
    ))(init_state, acts)
