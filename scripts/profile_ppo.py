#!/usr/bin/env python
"""PPO update throughput on TPU: pipelined updates with data-fetch sync."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from balatro_gym_tpu.train import ppo


def run(name, hooks, n_envs, updates=10):
    cfg = ppo.PPOConfig(n_envs=n_envs)
    init_fn, update_fn, _ = ppo.make_ppo(hooks, cfg)
    ts = init_fn(jax.random.key(0))
    step = jax.jit(lambda t: update_fn(t))
    ts, m = step(ts)
    float(m["mean_reward"])  # compile + true sync
    t0 = time.perf_counter()
    for _ in range(updates):
        ts, m = step(ts)
    float(m["mean_reward"])  # sync
    dt = (time.perf_counter() - t0) / updates
    sps = cfg.n_envs * cfg.rollout_len / dt
    print(json.dumps({"variant": name, "n_envs": n_envs,
                      "update_ms": round(dt * 1e3, 1),
                      "env_steps_per_s": round(sps)}), flush=True)


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    run("sim_8192", ppo.sim_env_hooks(), 8192)
    run("full_8192", ppo.full_env_hooks(), 8192)
    run("sim_32768", ppo.sim_env_hooks(), 32768)


if __name__ == "__main__":
    main()
