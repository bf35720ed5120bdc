#!/usr/bin/env python
"""Headline benchmark: vectorized env throughput (env-steps/s) on this chip.

Two workloads are measured and reported in ONE json line:

* ``value`` (headline) — the single-blind sim engine (BASELINE config 1
  semantics: play/discard hand-scoring episodes through the full sim scoring
  pipeline, 5 jokers, random legal policy, auto-reset) at 131072 lockstepped
  envs via the fused whole-rollout Pallas kernel (ops/fused_rollout.py).
  The kernel is validated bit-exactly against the jnp engine on replayed
  action scripts (tests/test_fused_rollout.py, scripts/validate_fused_tpu.py).
  Env counts are the measured saturation points of each kernel
  (scripts/probe_env_counts.py: sim 326M@8k -> 635M@131k, flat after;
  full 75M@8k -> 81M@16k).
* ``full_env_steps_per_sec`` — the flagship Discrete(60) full-game env
  (engine/full_env.py): 16384 envs through the fused full-env Pallas kernel
  (ops/fused_full_rollout.py) when a TPU is present, else the jnp
  vmap+scan path with mask-legal random actions.

Robustness: each throughput is the MEDIAN of SAMPLES timed runs;
``*_spread_pct`` reports (max-min)/median over those runs (the axon tunnel
shows run-to-run variance, VERDICT r1 "what's weak" #1). Sampled-mode seeds
are spaced by the kernel tile count so pipelined reps draw disjoint PRNG
streams. The CPU baseline runs the SAME scan length as the TPU path.

vs_baseline divides the headline by the jnp engine (engine/sim_env
.rollout_random) on the host CPU backend — the "vectorized CPU" baseline of
BASELINE.md (the reference itself publishes no numbers; its SubprocVecEnv
python envs are orders of magnitude slower still).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
from __future__ import annotations

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

from balatro_gym_tpu.engine import sim_env
from balatro_gym_tpu.ops.fused_rollout import TILE, rollout_fused

N_ENVS = 131072       # TPU sim-kernel shape: throughput saturates here
N_ENVS_FULL = 131072  # TPU full-env kernel saturation shape (grid-size
# sweep scripts/probe_env_counts.py + /tmp-style shape sweeps each round —
# the round-5 op-count cuts moved saturation from 65536 to 131072;
# 16384 also reported for r04 comparability)
N_ENVS_CPU = 8192     # CPU-baseline shape: CPU throughput is flat in env
#                       count (cache/bandwidth-bound) — measured at its own
#                       best shape so the ratio stays fair (see
#                       scripts/probe_env_counts.py for the sweep)
N_STEPS = 256
JOKERS = (1, 31, 34, 48, 72)

REPS = 8      # pipelined dispatches per timed sample
SAMPLES = 5   # timed samples -> median + spread
N_TILES = N_ENVS // TILE


def _median_spread(times, work):
    """(median throughput, spread %) from per-sample wall times."""
    tputs = [work / t for t in times]
    med = statistics.median(tputs)
    spread = 100.0 * (max(tputs) - min(tputs)) / med if med else 0.0
    return med, spread


def _fused_sim_throughput():
    """Compile + warm the fused sim kernel, then time SAMPLES x REPS
    pipelined rollouts.

    NOTE: on the axon backend ``block_until_ready`` can return before the
    remote execution has actually finished — only a data fetch truly syncs.
    Executions are in-order on the device stream, so fetching a scalar from
    the LAST rollout bounds all of them; the ~25 ms fetch round-trip
    amortizes over REPS rollouts.
    """
    for s in (0, 100):  # compile + verify completion through the tunnel
        float(rollout_fused(s, N_ENVS, N_STEPS, JOKERS)["total_reward"][0])
    times = []
    seed = 1
    for _ in range(SAMPLES):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = rollout_fused(seed, N_ENVS, N_STEPS, JOKERS)
            seed += N_TILES  # disjoint per-tile streams across reps
        float(out["total_reward"][0])  # true sync
        times.append(time.perf_counter() - t0)
    return _median_spread(times, REPS * N_ENVS * N_STEPS)


def _jnp_sim_throughput(device, n_envs):
    """The jnp sim engine on `device` (the CPU baseline), same scan length
    as the TPU path; median-of-SAMPLES."""
    with jax.default_device(device):
        fn = jax.jit(sim_env.rollout_random, static_argnums=(1, 2))
        jax.block_until_ready(fn(jax.random.key(0), n_envs, N_STEPS, JOKERS))
        times = []
        for i in range(SAMPLES):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(jax.random.key(1 + i), n_envs, N_STEPS, JOKERS))
            times.append(time.perf_counter() - t0)
    return _median_spread(times, n_envs * N_STEPS)


def _full_env_throughput(on_accelerator: bool):
    """Flagship Discrete(60) env throughput at 8192 envs.

    On a TPU: the fused full-env Pallas kernel (sampling mode, REPS
    pipelined rollouts per sample, true data-fetch sync). On CPU: one jnp
    mask-legal random rollout (shorter scan; throughput normalizes).

    Returns (throughput, spread_pct, path, error) where ``path`` is
    "fused" or "jnp-fallback" and ``error`` carries the kernel exception
    text when the fused path failed — a failed kernel must never
    masquerade as a measured number (VERDICT r2 weak #1).
    """
    fused_error = None
    if on_accelerator:
        try:
            from balatro_gym_tpu.ops.fused_full_rollout import rollout_full_fused

            nf_tiles = N_ENVS_FULL // TILE
            for s in (0, 100):
                float(rollout_full_fused(s, N_ENVS_FULL, N_STEPS)["total_reward"][0])
            times = []
            seed = 1
            for _ in range(SAMPLES):
                t0 = time.perf_counter()
                for _ in range(REPS):
                    out = rollout_full_fused(seed, N_ENVS_FULL, N_STEPS)
                    seed += nf_tiles
                float(out["total_reward"][0])
                times.append(time.perf_counter() - t0)
            med, spread = _median_spread(times, REPS * N_ENVS_FULL * N_STEPS)
            # r04-comparable shape (the old bench ran 16384): cheap
            # secondary sample so round-over-round deltas stay readable.
            n16 = 16384
            float(rollout_full_fused(0, n16, N_STEPS)["total_reward"][0])
            t16 = []
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(REPS):
                    out = rollout_full_fused(seed, n16, N_STEPS)
                    seed += n16 // TILE
                float(out["total_reward"][0])
                t16.append(time.perf_counter() - t0)
            med16, _ = _median_spread(t16, REPS * n16 * N_STEPS)
            return med, spread, "fused", None, round(med16, 1)
        except Exception as e:  # noqa: BLE001 - reported, not swallowed
            fused_error = f"{type(e).__name__}: {e}"
            print(f"fused full-env kernel FAILED, falling back to jnp: "
                  f"{fused_error[:2000]}", file=sys.stderr)

    if on_accelerator:
        n_envs, n_steps = 8192, 64
    else:
        n_envs, n_steps = 512, 32  # jnp full env on 2 host cores: keep it short
    med, spread = _jnp_full_env_throughput(None, n_envs, n_steps)
    return med, spread, "jnp-fallback", fused_error, None


def _jnp_full_env_throughput(device, n_envs, n_steps, samples=2):
    """The jnp flagship env (vmap+scan, mask-legal random actions) on
    `device` (None = default). Used both as the accelerator fallback and as
    the CPU denominator for ``full_env_vs_baseline``."""
    from balatro_gym_tpu.engine import full_env as fe

    def rollout(key):
        ks, ka = jax.random.split(key)
        states = jax.vmap(fe.reset)(jax.random.split(ks, n_envs))

        def body(carry, k):
            sts, _ = carry
            mask = jax.vmap(fe.action_mask)(sts)
            logits = jnp.where(mask, 0.0, -jnp.inf)
            acts = jax.random.categorical(k, logits)
            sts, rew, _ = jax.vmap(fe.step_autoreset)(sts, acts)
            return (sts, rew.sum()), None

        (states, last), _ = jax.lax.scan(
            body, (states, jnp.float32(0)), jax.random.split(ka, n_steps))
        return last

    import contextlib
    ctx = jax.default_device(device) if device is not None else contextlib.nullcontext()
    with ctx:
        fn = jax.jit(rollout)
        jax.block_until_ready(fn(jax.random.key(0)))
        times = []
        for i in range(samples):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(jax.random.key(1 + i)))
            times.append(time.perf_counter() - t0)
    return _median_spread(times, n_envs * n_steps)


def _policy_collect_throughput():
    """PPO env-side collection: feature-major ActorCritic -> single-step
    fused kernel, scan'd (ops/fused_policy_rollout.py — what
    PPOConfig(fused_rollout=True) runs). TPU only (Mosaic). Returns
    (throughput, spread_pct, error)."""
    try:
        import jax.numpy as jnp  # noqa: F811 (module scope alias)

        from balatro_gym_tpu.engine import full_env as fe
        from balatro_gym_tpu.ops import fused_policy_rollout as FP
        from balatro_gym_tpu.train.networks import ActorCritic

        n_envs, n_steps, reps = 8192, 256, 4
        net = ActorCritic(n_actions=FP.N_ACTIONS)
        params = net.init(jax.random.key(1), jnp.zeros((1, FP.OBS_DIM)),
                          jnp.ones((1, FP.N_ACTIONS), bool))
        st0 = jax.jit(lambda k: jax.vmap(fe.reset)(
            jax.random.split(k, n_envs)))(jax.random.key(4))
        cards, ints, rng = FP.tile_packed(FP.pack_full_state(st0))
        obs, mask = FP.observe_tiles(cards, ints, rng)
        carry, traj = FP._collect(params, cards, ints, rng, obs, mask,
                                  jax.random.key(5), n_steps)
        float(traj["reward"][0, 0])  # compile + true sync
        times = []
        k = 10
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                carry, traj = FP._collect(params, *carry, jax.random.key(k),
                                          n_steps)
                k += 1
            float(traj["reward"][0, 0])
            times.append(time.perf_counter() - t0)
        med, spread = _median_spread(times, reps * n_envs * n_steps)
        return med, spread, None
    except Exception as e:  # noqa: BLE001 - reported, not swallowed
        err = f"{type(e).__name__}: {e}"
        print(f"policy-collect bench FAILED: {err[:2000]}", file=sys.stderr)
        return None, None, err


def main():
    on_accelerator = jax.default_backend() != "cpu"
    if on_accelerator:
        value, spread = _fused_sim_throughput()
    else:  # CPU-only fallback: the Pallas kernels need a TPU to lower
        value, spread = _jnp_sim_throughput(jax.devices()[0], N_ENVS_CPU)

    vs_baseline = 1.0
    cpu = None
    try:
        cpu = jax.devices("cpu")[0]
        if on_accelerator and cpu != jax.devices()[0]:
            cpu_tput, _ = _jnp_sim_throughput(cpu, N_ENVS_CPU)
            vs_baseline = value / cpu_tput
    except RuntimeError:
        cpu = None  # no separate cpu backend visible; report 1.0

    (full_tput, full_spread, full_path, full_err,
     full_16k) = _full_env_throughput(on_accelerator)

    # Flagship-env CPU denominator (BASELINE.md's >=10x/chip target).
    full_vs_baseline = 1.0
    if on_accelerator and cpu is not None:
        full_cpu_tput, _ = _jnp_full_env_throughput(cpu, 512, 32)
        full_vs_baseline = full_tput / full_cpu_tput

    # PPO env-side collection (policy-in-the-loop, fused kernel) — TPU only.
    collect_tput = collect_spread = collect_err = None
    if on_accelerator:
        collect_tput, collect_spread, collect_err = _policy_collect_throughput()

    out = {
        "metric": "env_steps_per_sec",
        "value": round(value, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(vs_baseline, 3),
        "spread_pct": round(spread, 1),
        "samples": SAMPLES,
        "reps_per_sample": REPS,
        "n_envs": N_ENVS if on_accelerator else N_ENVS_CPU,
        "full_env_n_envs": N_ENVS_FULL if on_accelerator else 512,
        "full_env_steps_per_sec": round(full_tput, 1),
        "full_env_spread_pct": round(full_spread, 1),
        "full_env_path": full_path,
        "full_env_vs_baseline": round(full_vs_baseline, 3),
    }
    if full_16k is not None:
        out["full_env_steps_per_sec_16k"] = full_16k
    if full_err is not None:
        out["full_env_error"] = full_err[:500]
    if collect_tput is not None:
        out["policy_collect_steps_per_sec"] = round(collect_tput, 1)
        out["policy_collect_spread_pct"] = round(collect_spread, 1)
    if collect_err is not None:
        out["policy_collect_error"] = collect_err[:500]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
