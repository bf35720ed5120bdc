#!/usr/bin/env python
"""TPU validation + benchmark of the fused rollout kernel.

1. Replays fixed legal action scripts on the TPU kernel and on the
   interpret-mode (CPU) kernel — final states must match bit-exactly
   (the interpret path is itself proven against the x64 jnp oracle by
   tests/test_fused_rollout.py).
2. Distribution check of sampling mode vs the jnp rollout (mean reward /
   episodes within a few percent).
3. Times sampling mode at bench shape (8192 envs x 256 steps).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.engine import sim_env
from balatro_gym_tpu.ops.fused_rollout import rollout_fused, TILE

JOKERS = (1, 31, 34, 48, 72)


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rng = np.random.default_rng(7)
    B, T = TILE, 7
    acts = rng.integers(0, 5, (T, B)).astype(np.int32)  # plays always legal

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ref = jax.device_get(rollout_fused(0, B, T, JOKERS, actions=acts,
                                           interpret=True))
    got = jax.device_get(rollout_fused(0, B, T, JOKERS, actions=acts))
    ok = True
    for k in ("hand_rank", "hand_suit", "deck_n", "money", "hands_left",
              "discards_left", "score", "episodes"):
        same = np.array_equal(ref[k], got[k])
        ok &= same
        print(f"{'OK ' if same else 'MISMATCH '}{k}", flush=True)
    rdiff = float(np.max(np.abs(ref["total_reward"] - got["total_reward"])))
    print(f"reward max abs diff: {rdiff}", flush=True)

    # Sampling-mode distribution vs the jnp engine (random policy).
    n_envs, n_steps = 8192, 256
    out = jax.device_get(rollout_fused(1, n_envs, n_steps, JOKERS))
    mean_r = float(np.sum(out["total_reward"])) / n_envs
    eps = int(np.sum(out["episodes"]))
    _, jr, jeps = jax.jit(sim_env.rollout_random, static_argnums=(1, 2))(
        jax.random.key(1), n_envs, n_steps, JOKERS)
    jmean = float(jr) / n_envs
    print(json.dumps({"fused_mean_reward": round(mean_r, 2),
                      "jnp_mean_reward": round(jmean, 2),
                      "fused_episodes": eps, "jnp_episodes": int(jeps)}),
          flush=True)

    # Throughput.
    for tag, ne, ns in (("bench", 8192, 256), ("large", 32768, 256)):
        f = lambda s: rollout_fused(s, ne, ns, JOKERS)
        t0 = time.perf_counter()
        jax.block_until_ready(f(2)["total_reward"])
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(3 + i)["total_reward"])
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"variant": tag, "n_envs": ne,
                          "steps_per_s": round(ne * ns / best),
                          "compile_s": round(compile_s, 1)}), flush=True)
    print("PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
