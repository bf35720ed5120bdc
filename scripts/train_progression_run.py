#!/usr/bin/env python
"""Recorded progressive-training run (reference train_progressive.py:21-120).

Trains flagship-env PPO twice with the SAME budget — plain, and with the
on-device ProgressionRewardWrapper semantics (train/progression.py) — then
evaluates BOTH policies on the unwrapped env (sampled + greedy-antiloop)
and writes docs/training_summary_progression.json. The comparison metric
is eval mean peak ante on the raw env.

Run on the TPU: python scripts/train_progression_run.py [--updates 3000]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from balatro_gym_tpu.train.evaluate import evaluate_policy
from balatro_gym_tpu.train.ppo import PPOConfig, full_env_hooks, make_ppo
from balatro_gym_tpu.train.progression import progression_hooks

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "training_summary_progression.json")


def run(tag, hooks, eval_hooks, cfg, updates, seed, log_every=500):
    init_fn, update_fn, policy_fn = make_ppo(hooks, cfg)
    step = jax.jit(update_fn, donate_argnums=(0,))
    ts = init_fn(jax.random.key(seed))
    curve = []
    t0 = time.time()
    for i in range(updates):
        ts, m = step(ts)
        if (i + 1) % log_every == 0:
            row = {"update": i + 1,
                   "mean_reward": round(float(m["mean_reward"]), 3),
                   "entropy": round(float(m["entropy"]), 3)}
            curve.append(row)
            print(f"[{tag}] {row}", flush=True)
    jax.block_until_ready(ts.params)
    wall = time.time() - t0

    evals = {}
    for mode, greedy in (("sampled", False), ("greedy_antiloop", True)):
        evals[mode] = evaluate_policy(
            policy_fn, ts.params, eval_hooks, n_episodes=256, max_steps=1024,
            seed=1234, greedy=greedy, obs_stats=ts.obs_stats)
        print(f"[{tag}] eval {mode}: {evals[mode]}", flush=True)
    return {"updates": updates, "wall_s": round(wall, 1),
            "env_steps": updates * cfg.n_envs * cfg.rollout_len,
            "curve": curve, "eval": evals}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=3000)
    ap.add_argument("--n-envs", type=int, default=1024)
    ap.add_argument("--rollout", type=int, default=128)
    args = ap.parse_args()

    cfg = PPOConfig(n_envs=args.n_envs, rollout_len=args.rollout)
    base = full_env_hooks()
    prog = progression_hooks(base)

    out = {"config": {"n_envs": cfg.n_envs, "rollout_len": cfg.rollout_len,
                      "updates": args.updates},
           "plain": run("plain", base, base, cfg, args.updates, seed=0),
           "progression": run("progression", prog, base, cfg, args.updates,
                              seed=0)}
    d = {m: {mode: {k: out[m]["eval"][mode].get(k) for k in
                    ("mean_ante", "max_ante", "episodes")}
             for mode in ("sampled", "greedy_antiloop")}
         for m in ("plain", "progression")}
    out["headline"] = d
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(d))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
