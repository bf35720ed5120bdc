#!/usr/bin/env python
"""Headline benchmark: vectorized env throughput (env-steps/s) on this chip.

Measures the jitted, vmapped, auto-resetting single-blind engine
(balatro_gym_tpu.engine.sim_env — BASELINE config 1 semantics: play/discard
hand-scoring episodes through the full sim scoring pipeline) at 8192
lockstepped envs, on the default JAX backend (the TPU chip under the driver).

vs_baseline divides by the same engine run on the host CPU backend — the
"vectorized CPU" baseline of BASELINE.md (the reference itself publishes no
numbers; its SubprocVecEnv python envs are orders of magnitude slower still).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax

from balatro_gym_tpu.engine import sim_env

N_ENVS = 8192
N_STEPS = 256
CPU_STEPS = 32  # cpu baseline uses fewer scan steps; throughput normalizes


def _throughput(device, n_envs, n_steps, *, jokers=(1, 31, 34, 48, 72)):
    """Compile, warm up, then time one rollout. Returns env-steps/s."""
    with jax.default_device(device):
        fn = jax.jit(sim_env.rollout_random, static_argnums=(1, 2))
        out = fn(jax.random.key(0), n_envs, n_steps, jokers)
        jax.block_until_ready(out)  # compile + warm
        t0 = time.perf_counter()
        out = fn(jax.random.key(1), n_envs, n_steps, jokers)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
    return n_envs * n_steps / dt


def main():
    # Note: the axon TPU backend's executables are not persistently
    # cacheable, so the multi-minute TPU compile happens every run; the two
    # host cores make overlapping the CPU baseline a net loss — sequential.
    default = jax.devices()[0]
    value = _throughput(default, N_ENVS, N_STEPS)

    vs_baseline = 1.0
    try:
        cpu = jax.devices("cpu")[0]
        if cpu != default:
            cpu_tput = _throughput(cpu, N_ENVS, CPU_STEPS)
            vs_baseline = value / cpu_tput
    except RuntimeError:
        pass  # no separate cpu backend visible; report 1.0

    print(json.dumps({
        "metric": "env_steps_per_sec_8192envs",
        "value": round(value, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
