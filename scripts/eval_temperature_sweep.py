#!/usr/bin/env python
"""Decode-temperature sweep on a trained flagship policy.

Trains full-env PPO briefly, then evaluates the SAME policy at decode
temperatures 1.0 -> 0.25 plus greedy-antiloop, quantifying how much
policy strength the default sampled eval hides (the reference's SB3 eval
samples at T=1; train_balatro_agent.py:538-601). Writes
docs/eval_temperature_sweep.json.

Run on the TPU: python scripts/eval_temperature_sweep.py [--updates 1500]
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

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "eval_temperature_sweep.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=1500)
    ap.add_argument("--n-envs", type=int, default=1024)
    ap.add_argument("--rollout", type=int, default=128)
    args = ap.parse_args()

    cfg = PPOConfig(n_envs=args.n_envs, rollout_len=args.rollout)
    hooks = full_env_hooks()
    init_fn, update_fn, policy_fn = make_ppo(hooks, cfg)
    step = jax.jit(update_fn, donate_argnums=(0,))
    ts = init_fn(jax.random.key(0))
    t0 = time.time()
    for i in range(args.updates):
        ts, m = step(ts)
        if (i + 1) % 500 == 0:
            print(f"update {i+1}: mean_reward="
                  f"{float(m['mean_reward']):.2f}", flush=True)
    jax.block_until_ready(ts.params)
    wall = time.time() - t0

    out = {"config": {"n_envs": cfg.n_envs, "rollout_len": cfg.rollout_len,
                      "updates": args.updates,
                      "env_steps": args.updates * cfg.n_envs * cfg.rollout_len,
                      "train_wall_s": round(wall, 1)},
           "sweep": []}
    for label, kw in (("T=1.0", dict(greedy=False, temperature=1.0)),
                      ("T=0.7", dict(greedy=False, temperature=0.7)),
                      ("T=0.5", dict(greedy=False, temperature=0.5)),
                      ("T=0.35", dict(greedy=False, temperature=0.35)),
                      ("T=0.25", dict(greedy=False, temperature=0.25)),
                      ("greedy_antiloop", dict(greedy=True))):
        s = evaluate_policy(policy_fn, ts.params, hooks, n_episodes=256,
                            max_steps=1024, seed=1234,
                            obs_stats=ts.obs_stats, **kw)
        row = {"decode": label,
               "mean_ante": round(s["mean_ante"], 2),
               "max_ante": s["max_ante"],
               "mean_reward": round(s["mean_reward"], 1),
               "episodes": s["episodes"]}
        out["sweep"].append(row)
        print(json.dumps(row), flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
