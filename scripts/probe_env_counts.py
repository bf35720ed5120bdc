#!/usr/bin/env python
"""Throughput sweep over env counts for both fused kernels on the real TPU.

The kernels run a grid over (SUB, LANES) tiles, so compile time is
independent of n_envs — sweeping is cheap. Finds the best bench shape:
more tiles amortize per-dispatch overhead until VMEM/HBM residency or the
scalar-unit loop bound dominates.

Usage: python scripts/probe_env_counts.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from balatro_gym_tpu.ops.fused_rollout import TILE, rollout_fused  # noqa: E402
from balatro_gym_tpu.ops.fused_full_rollout import rollout_full_fused  # noqa: E402

N_STEPS = 256
JOKERS = (1, 31, 34, 48, 72)
REPS = 8


def probe(label, fn, n_envs):
    try:
        t0 = time.perf_counter()
        float(fn(0, n_envs)["total_reward"][0])
        compile_s = time.perf_counter() - t0
        best = float("inf")
        seed = 1
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(seed, n_envs)
                seed += n_envs // TILE
            float(out["total_reward"][0])  # data fetch = true sync on axon
            best = min(best, time.perf_counter() - t0)
        tput = REPS * n_envs * N_STEPS / best
        print(f"{label} n_envs={n_envs:6d}: {tput/1e6:8.1f}M steps/s "
              f"(compile {compile_s:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label} n_envs={n_envs:6d}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    sim = lambda s, n: rollout_fused(s, n, N_STEPS, JOKERS)
    full = lambda s, n: rollout_full_fused(s, n, N_STEPS)
    for n in (8192, 16384, 32768, 65536):
        probe("sim ", sim, n)
    for n in (8192, 16384, 32768):
        probe("full", full, n)


if __name__ == "__main__":
    main()
