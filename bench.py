#!/usr/bin/env python
"""Headline benchmark: vectorized env throughput (env-steps/s) on this chip.

Measures the single-blind engine (BASELINE config 1 semantics: play/discard
hand-scoring episodes through the full sim scoring pipeline, 5 jokers,
random legal policy, auto-reset) at 8192 lockstepped envs on the default
backend (the TPU chip under the driver), using the fused whole-rollout
Pallas kernel (ops/fused_rollout.py) — env state lives in VMEM across all
256 steps, so the chip executes one kernel per rollout instead of hundreds
of small XLA ops per step. The kernel is validated bit-exactly against the
jnp engine on replayed action scripts (tests/test_fused_rollout.py,
scripts/validate_fused_tpu.py).

vs_baseline divides by the jnp engine (engine/sim_env.rollout_random) run
on the host CPU backend — the "vectorized CPU" baseline of BASELINE.md (the
reference itself publishes no numbers; its SubprocVecEnv python envs are
orders of magnitude slower still).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax

from balatro_gym_tpu.engine import sim_env
from balatro_gym_tpu.ops.fused_rollout import rollout_fused

N_ENVS = 8192
N_STEPS = 256
CPU_STEPS = 32  # cpu baseline uses fewer scan steps; throughput normalizes
JOKERS = (1, 31, 34, 48, 72)


REPS = 8


def _fused_throughput(n_envs, n_steps):
    """Compile + warm the fused kernel, then time REPS pipelined rollouts.

    NOTE: on the axon backend ``block_until_ready`` can return before the
    remote execution has actually finished — only a data fetch is a true
    sync. Executions are in-order on the device stream, so fetching a
    scalar from the LAST rollout bounds all of them; the ~25 ms fetch
    round-trip amortizes over REPS rollouts.
    """
    for s in (0, 100):  # compile + verify completion through the tunnel
        float(rollout_fused(s, n_envs, n_steps, JOKERS)["total_reward"][0])
    t0 = time.perf_counter()
    for i in range(REPS):
        out = rollout_fused(1 + i, n_envs, n_steps, JOKERS)
    float(out["total_reward"][0])  # true sync
    dt = time.perf_counter() - t0
    return REPS * n_envs * n_steps / dt


def _jnp_throughput(device, n_envs, n_steps):
    """The jnp engine on `device` (used for the CPU baseline); best-of-2
    to damp noise from the 2-core host."""
    with jax.default_device(device):
        fn = jax.jit(sim_env.rollout_random, static_argnums=(1, 2))
        out = fn(jax.random.key(0), n_envs, n_steps, JOKERS)
        jax.block_until_ready(out)  # compile + warm
        best = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            out = fn(jax.random.key(1 + i), n_envs, n_steps, JOKERS)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
    return n_envs * n_steps / best


def main():
    on_accelerator = jax.default_backend() != "cpu"
    if on_accelerator:
        value = _fused_throughput(N_ENVS, N_STEPS)
    else:  # CPU-only fallback: the Pallas kernel needs a TPU to lower
        value = _jnp_throughput(jax.devices()[0], N_ENVS, CPU_STEPS)

    vs_baseline = 1.0
    try:
        cpu = jax.devices("cpu")[0]
        if on_accelerator and cpu != jax.devices()[0]:
            cpu_tput = _jnp_throughput(cpu, N_ENVS, CPU_STEPS)
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
