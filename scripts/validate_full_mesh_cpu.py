#!/usr/bin/env python
"""CPU-mesh leg of the flagship-under-mesh proof chain (round-4 item 1).

``parallel.mesh.rollout_full_sharded`` wraps the fused full-env kernel in
shard_map: it shards the FullEnvState pytree and the action matrix over the
data axis, strides sampling seeds by the local tile count, and stitches the
per-shard outputs. This validates that WRAPPER logic bit-exactly on a
2-device CPU mesh:

* FED mode: sharded == single-device on every state leaf / reward /
  episode count — proves state sharding specs and action slicing;
* SAMPLING mode: each shard's outputs reflect ``seed + shard *
  n_local_tiles`` — proves the aliasing-free seed striding.

The body is injected through the ``_rollout_fn`` seam as a cheap stand-in
that folds every input (state leaves, actions, seed) into its outputs —
the REAL kernel body cannot compile on XLA:CPU in test time (the
interpret-mode step body exceeds an hour even at
--xla_backend_optimization_level=0; measured round 4). The kernel's own
semantics are proven elsewhere (tests/test_fused_full_rollout.py fed-mode
battery), and the wrapper composed WITH the real kernel is proven on the
real chip by scripts/validate_full_sharded_tpu.py (full chain in that
script's docstring).

``--gold`` additionally runs the interpret-mode whole-kernel equality —
only for an idle host with ~90 min to spare.

Exit 0 = all checks passed. Invoked by tests/test_full_mesh.py.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_backend_optimization_level=0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_num_cpu_devices", 2)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from balatro_gym_tpu.ops import fused_full_rollout as FF  # noqa: E402
from balatro_gym_tpu.parallel import mesh as M  # noqa: E402


def _standin(seed, n_envs, n_steps, *, actions=None, init_state=None,
             interpret=False):
    """rollout_full_fused-shaped stand-in: outputs fold in every input so
    any wrapper slicing/striding mistake breaks bit-equality."""
    del interpret
    seed = jnp.asarray(seed, jnp.int32)
    mix = jnp.zeros(n_envs, jnp.int32)
    for leaf in jax.tree.leaves(init_state):
        if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            leaf = jax.random.key_data(leaf)
        flat = leaf.reshape(n_envs, -1).astype(jnp.int32)
        mix = mix + jnp.sum(flat * (1 + jnp.arange(flat.shape[1],
                                                   dtype=jnp.int32)), axis=1)
    a_mix = (jnp.zeros(n_envs, jnp.int32) if actions is None
             else jnp.sum(jnp.asarray(actions, jnp.int32)
                          * (1 + jnp.arange(n_steps, dtype=jnp.int32))[:, None],
                          axis=0))
    sval = seed if actions is None else jnp.int32(0)  # kernel ignores seed in fed mode
    state = init_state.replace(
        money=init_state.money + a_mix + sval,
        step_count=init_state.step_count + n_steps)
    return {"state": state,
            "total_reward": (mix + a_mix * 3 + sval * 7).astype(jnp.float32),
            "episodes": (a_mix + sval) % 7}


def check_fed(n_steps: int) -> None:
    n_envs = 4 * FF.TILE  # two tiles per device
    mesh = M.make_mesh(2)
    env = np.arange(n_envs)
    acts = np.stack([(env + t) % 60 for t in range(n_steps)]).astype(np.int32)
    init_state = FF._default_reset(7, n_envs)

    single = _standin(0, n_envs, n_steps, actions=jnp.asarray(acts),
                      init_state=init_state)
    sharded = M.rollout_full_sharded(0, n_envs, n_steps, mesh=mesh,
                                     actions=acts, init_state=init_state,
                                     _rollout_fn=_standin)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(single),
            jax.tree_util.tree_leaves_with_path(sharded)):
        if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a),
                                      err_msg=f"fed-mode leaf {pa}")
    print(f"fed-mode wrapper equality: {n_envs} envs bit-exact "
          f"(every state leaf + reward + episodes)")


def check_sampling() -> None:
    n_envs = 4 * FF.TILE
    n_local_tiles = (n_envs // 2) // FF.TILE  # = 2
    mesh = M.make_mesh(2)
    init_state = FF._default_reset(7, n_envs)
    sharded = M.rollout_full_sharded(3, n_envs, 5, mesh=mesh,
                                     init_state=init_state,
                                     _rollout_fn=_standin)
    # Expected: shard s ran the stand-in with seed 3 + s * n_local_tiles.
    half = n_envs // 2
    expect = np.concatenate([
        np.asarray(_standin(3 + s * n_local_tiles, half, 5,
                            init_state=jax.tree.map(
                                lambda x: x[s * half:(s + 1) * half],
                                init_state))["total_reward"])
        for s in range(2)])
    np.testing.assert_array_equal(np.asarray(sharded["total_reward"]), expect,
                                  err_msg="sampling-mode seed striding")
    print("sampling-mode seed striding: shard seeds = seed + shard * "
          f"{n_local_tiles}, verified on every env lane")


def check_gold_interpret(n_steps: int) -> None:
    n_envs = 2 * FF.TILE
    mesh = M.make_mesh(2)
    env = np.arange(n_envs)
    script = [45 + env % 3, 2 + env % 5, 2 + (env + 1) % 5,
              np.zeros(n_envs, np.int64)]
    acts = np.stack([script[t % len(script)] for t in range(n_steps)]
                    ).astype(np.int32)
    init_state = FF._default_reset(7, n_envs)
    single = FF.rollout_full_fused(0, n_envs, n_steps, actions=acts,
                                   init_state=init_state, interpret=True)
    sharded = M.rollout_full_sharded(0, n_envs, n_steps, mesh=mesh,
                                     actions=acts, init_state=init_state,
                                     interpret=True)
    ps = FF.pack_full_state(single["state"])
    pm = FF.pack_full_state(sharded["state"])
    for k in ("cards", "ints", "rng"):
        np.testing.assert_array_equal(np.asarray(pm[k]), np.asarray(ps[k]))
    np.testing.assert_array_equal(np.asarray(sharded["total_reward"]),
                                  np.asarray(single["total_reward"]))
    print("gold interpret-mode equality: bit-exact")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--gold", action="store_true",
                    help="also run the interpret-mode real-kernel equality "
                         "(~90 min XLA:CPU compile)")
    args = ap.parse_args()
    t0 = time.time()
    check_fed(args.steps)
    check_sampling()
    if args.gold:
        check_gold_interpret(4)
    print(f"OK ({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
