#!/usr/bin/env python
"""PPO end-to-end sweep: find the config that closes the learner-update gap.

Round-3 state (docs/PERF.md): fused collection runs at 23.5M env-steps/s but
PPO end-to-end sits at ~3.4M steady-state — the update (4 epochs x 4
minibatches over 131k samples) eats ~85% of wall time. This sweeps the
update-side knobs at fixed collection settings and reports steady-state
env-steps/s per config on the real chip:

* rollout_len (amortizes per-update fixed cost over more env steps),
* epochs x minibatches (fewer, larger optimizer steps -> better MXU use),
* bf16_compute (MXU-native matmuls; the fm collection mirror is
  structurally bf16-exact per tests/test_fused_policy_rollout.py).

Timing discipline per CLAUDE.md: data-fetch syncs, median of samples,
chip otherwise idle. Usage: python scripts/sweep_ppo_update.py [--updates 6]
"""
import argparse
import functools
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax


def measure(cfg_kwargs, updates, samples=3):
    from balatro_gym_tpu.train.ppo import PPOConfig, full_env_hooks, make_ppo

    cfg = PPOConfig(**cfg_kwargs)
    init_fn, update_fn, _ = make_ppo(full_env_hooks(), cfg)
    ts = init_fn(jax.random.key(0))
    step = jax.jit(functools.partial(update_fn, axis_name=None),
                   donate_argnums=(0,))
    t0 = time.perf_counter()
    ts, m = step(ts)
    float(m["loss"])  # compile + true sync (axon)
    compile_s = time.perf_counter() - t0
    tputs = []
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(updates):
            ts, m = step(ts)
        float(m["loss"])
        dt = time.perf_counter() - t0
        tputs.append(updates * cfg.n_envs * cfg.rollout_len / dt)
    med = statistics.median(tputs)
    spread = 100.0 * (max(tputs) - min(tputs)) / med
    return med, spread, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=6)
    ap.add_argument("--n-envs", type=int, default=8192)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    base = dict(n_envs=args.n_envs, fused_rollout=True)
    grid = [
        # r03 baseline
        dict(rollout_len=16, epochs=4, minibatches=4),
        # epoch/minibatch reductions
        dict(rollout_len=16, epochs=2, minibatches=4),
        dict(rollout_len=16, epochs=4, minibatches=1),
        dict(rollout_len=16, epochs=2, minibatches=1),
        dict(rollout_len=16, epochs=1, minibatches=1),
        # longer rollouts (amortize fixed update cost)
        dict(rollout_len=64, epochs=4, minibatches=4),
        dict(rollout_len=64, epochs=2, minibatches=4),
        dict(rollout_len=64, epochs=1, minibatches=4),
        # bf16 learner+collection
        dict(rollout_len=16, epochs=4, minibatches=4, bf16_compute=True),
        dict(rollout_len=64, epochs=2, minibatches=4, bf16_compute=True),
        dict(rollout_len=64, epochs=1, minibatches=4, bf16_compute=True),
    ]
    if args.quick:
        grid = grid[:3]
    results = []
    for g in grid:
        cfg = dict(base, **g)
        try:
            tput, spread, compile_s = measure(cfg, args.updates)
            row = dict(cfg, steps_per_sec=round(tput),
                       spread_pct=round(spread, 1),
                       compile_s=round(compile_s, 1))
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            row = dict(cfg, error=f"{type(e).__name__}: {e}"[:300])
        results.append(row)
        print(json.dumps(row), flush=True)
    best = max((r for r in results if "steps_per_sec" in r),
               key=lambda r: r["steps_per_sec"], default=None)
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
