"""Multi-device scaling-efficiency benchmark (BASELINE ≥80% target).

Measures the data-parallel PPO update's env-steps/s at mesh sizes 1 and N
(same per-device env count — weak scaling) and reports efficiency
N_throughput / (N * 1_throughput). On real hardware run under a pod slice;
in CI it runs on the virtual CPU mesh (jax_num_cpu_devices).

Usage: python -m balatro_gym_tpu.parallel.scaling_bench [--envs-per-dev 64]
"""
from __future__ import annotations

import argparse
import json
import time

import jax

from balatro_gym_tpu.parallel.mesh import make_distributed_ppo, make_mesh
from balatro_gym_tpu.train.ppo import PPOConfig, full_env_hooks, sim_env_hooks


def measure(n_devices: int, envs_per_dev: int, rollout: int = 8,
            updates: int = 4, seed: int = 0, env: str = "sim") -> float:
    """env-steps/s of the distributed update at the given mesh size."""
    mesh = make_mesh(n_devices)
    cfg = PPOConfig(n_envs=envs_per_dev * n_devices, rollout_len=rollout,
                    epochs=1, minibatches=2, hidden=(64,))
    hooks = full_env_hooks() if env == "full" else sim_env_hooks()
    init_fn, step_fn, _ = make_distributed_ppo(hooks, cfg, mesh)
    ts = init_fn(jax.random.key(seed))
    ts, m = step_fn(ts)  # compile + warm
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(updates):
        ts, m = step_fn(ts)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    return updates * cfg.n_envs * cfg.rollout_len / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--envs-per-dev", type=int, default=64)
    p.add_argument("--rollout", type=int, default=8)
    p.add_argument("--updates", type=int, default=4)
    p.add_argument("--env", choices=("sim", "full"), default="sim",
                   help="'full' = the flagship Discrete(60) env")
    args = p.parse_args(argv)

    n = len(jax.devices())
    t1 = measure(1, args.envs_per_dev, args.rollout, args.updates,
                 env=args.env)
    tn = measure(n, args.envs_per_dev, args.rollout, args.updates,
                 env=args.env)
    eff = tn / (n * t1)
    out = {
        "metric": "dp_scaling_efficiency",
        "env": args.env,
        "n_devices": n,
        "steps_per_sec_1dev": round(t1, 1),
        "steps_per_sec_ndev": round(tn, 1),
        "value": round(eff, 3),
        "unit": "fraction",
        "vs_baseline": round(eff / 0.8, 3),  # target ≥0.8
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":  # pragma: no cover
    main()
