#!/usr/bin/env python
"""Real-chip leg of the flagship-under-mesh proof chain (round-4 item 1).

The complete chain (each leg covers what the others cannot):

1. CPU 8-virtual-device mesh, jnp engine: full-env DP update lowers to
   all-reduce-only HLO and executes (tests/test_checkpoint_scaling.py::
   test_sharded_update_collectives_full_env), two-process loopback
   (tests/test_distributed_loopback.py), dryrun_multichip.
2. CPU 2-device mesh, stand-in body: ``rollout_full_sharded``'s
   sharding/slicing/seed-striding logic is bit-exact sharded-vs-single
   (tests/test_full_mesh.py — the kernel body itself cannot compile on
   XLA:CPU in test time; its semantics are proven separately by the
   fed-mode batteries).
3. THIS SCRIPT, real TPU: the wrapper composed with the REAL pallas kernel
   — ``rollout_full_sharded`` over a mesh of the real chip, fed-actions
   mode, bit-identical to the direct ``rollout_full_fused`` call; plus one
   data-parallel ``make_distributed_ppo(fused_rollout=True)`` update
   executing on the mesh (the shard_map -> pallas_call -> collectives
   lowering that the CPU legs cannot exercise).

Single-chip hardware means the mesh here is 1-device (the multi-device
slicing is leg 2's job); what this leg proves is that the REAL kernel
lowers and runs correctly inside shard_map.

Writes docs/full_mesh_validation.json. Run: python scripts/validate_full_sharded_tpu.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from balatro_gym_tpu.ops import fused_full_rollout as FF
from balatro_gym_tpu.parallel import mesh as M

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "full_mesh_validation.json")


def main():
    t0 = time.time()
    report = {"device": str(jax.devices()[0]),
              "mesh_devices": min(len(jax.devices()), 2)}
    n_dev = report["mesh_devices"]
    mesh = M.make_mesh(n_dev)
    n_envs = n_dev * 2 * FF.TILE
    n_steps = 24

    env = np.arange(n_envs)
    script = [45 + env % 3, 2 + env % 5, 2 + (env + 1) % 5,
              np.zeros(n_envs, np.int64)]
    acts = np.stack([script[t % len(script)] for t in range(n_steps)]
                    ).astype(np.int32)
    init_state = FF._default_reset(7, n_envs)

    single = FF.rollout_full_fused(0, n_envs, n_steps, actions=acts,
                                   init_state=init_state)
    float(single["total_reward"][0])
    sharded = M.rollout_full_sharded(0, n_envs, n_steps, mesh=mesh,
                                     actions=acts, init_state=init_state)
    float(sharded["total_reward"][0])

    ps = FF.pack_full_state(single["state"])
    pm = FF.pack_full_state(sharded["state"])
    for k in ("cards", "ints", "rng"):
        np.testing.assert_array_equal(np.asarray(pm[k]), np.asarray(ps[k]),
                                      err_msg=f"packed {k} rows differ")
    np.testing.assert_array_equal(np.asarray(sharded["total_reward"]),
                                  np.asarray(single["total_reward"]))
    np.testing.assert_array_equal(np.asarray(sharded["episodes"]),
                                  np.asarray(single["episodes"]))
    report["sharded_equality"] = {
        "n_envs": n_envs, "n_steps": n_steps, "bit_exact": True,
        "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(report["sharded_equality"]), flush=True)

    # Fused-collection DP PPO update on the mesh (real pallas inside
    # shard_map).
    from balatro_gym_tpu.train.ppo import PPOConfig, full_env_hooks

    t1 = time.time()
    cfg = PPOConfig(n_envs=n_dev * FF.TILE, rollout_len=4, epochs=1,
                    minibatches=2, hidden=(64,), fused_rollout=True,
                    env_shuffle=True)
    init_fn, step_fn, _ = M.make_distributed_ppo(full_env_hooks(), cfg, mesh)
    ts = init_fn(jax.random.key(0))
    ts, metrics = step_fn(ts)
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert int(ts.update_idx) == 1
    report["fused_distributed_ppo"] = {
        "n_envs": cfg.n_envs, "metrics": {k: round(v, 4)
                                          for k, v in vals.items()},
        "wall_s": round(time.time() - t1, 1)}
    print(json.dumps(report["fused_distributed_ppo"]), flush=True)

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(f"PASS ({time.time() - t0:.0f}s) -> {OUT}")


if __name__ == "__main__":
    main()
