#!/usr/bin/env python
"""Round-4 headline-RL runs: break the sampled-ante plateau.

The round-3 verdict (item 6): sampled-eval mean peak ante froze at ~9.4 for
three rounds with constant lr/entropy ("entropy still 1.23 after 3000
updates; no lr decay has been tried"). This runs the plateau-breaking
levers at much larger budgets (the round-4 fast PPO path trains ~4x more
env steps per wall second):

* linear entropy-coefficient decay (0.01 -> 5e-4) so the policy commits;
* linear lr decay (3e-4 -> 5e-5) to stabilize the late run;
* billions of env steps via the fused+env_shuffle+bf16 config;
* progression shaping (train/progression.py) composed with the decays.

Each run is evaluated on the RAW env with sampled decoding at temperatures
1.0 / 0.5 / 0.25 (a temperature is a decode POLICY, not an eval-side mask)
plus the greedy-antiloop reference point. Writes
docs/training_summary_headline_r04.json.

Run on the TPU: python scripts/train_headline_r04.py
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
                   "docs", "training_summary_headline_r04.json")


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
    for mode, kw in (("sampled_t1.0", dict(greedy=False, temperature=1.0)),
                     ("sampled_t0.5", dict(greedy=False, temperature=0.5)),
                     ("sampled_t0.25", dict(greedy=False, temperature=0.25)),
                     ("greedy_antiloop", dict(greedy=True))):
        evals[mode] = evaluate_policy(
            policy_fn, ts.params, eval_hooks, n_episodes=256, max_steps=1024,
            seed=123, obs_stats=ts.obs_stats, **kw)
        print(f"[{tag}] {mode}: {evals[mode]}", flush=True)
    return {"tag": tag, "updates": updates,
            "env_steps": updates * cfg.n_envs * cfg.rollout_len,
            "wall_s": round(wall, 1), "curve": curve, "evals": evals}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=2000)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    base = full_env_hooks()
    runs = {
        # fast config + decays: ~2.1B env steps in ~3 min of train wall
        "fast_decay": lambda u: run(
            "fast_decay", base, base,
            PPOConfig(n_envs=8192, rollout_len=128, epochs=1, minibatches=4,
                      fused_rollout=True, bf16_compute=True, env_shuffle=True,
                      total_updates=u, ent_coef_final=5e-4, lr_final=5e-5),
            u, seed=0),
        # 4-epoch config + decays: better per-sample learning, ~1.05B steps
        "e4_decay": lambda u: run(
            "e4_decay", base, base,
            PPOConfig(n_envs=8192, rollout_len=64, epochs=4, minibatches=4,
                      fused_rollout=True, bf16_compute=True, env_shuffle=True,
                      total_updates=u, ent_coef_final=5e-4, lr_final=5e-5),
            u, seed=1),
        # progression shaping (jnp path — shaping lives outside the kernel)
        "prog_decay": lambda u: run(
            "prog_decay", progression_hooks(base), base,
            PPOConfig(n_envs=8192, rollout_len=16, epochs=4, minibatches=4,
                      env_shuffle=True, total_updates=u,
                      ent_coef_final=5e-4, lr_final=5e-5),
            u, seed=2),
    }
    results = {}
    for name, fn in runs.items():
        if args.only and name != args.only:
            continue
        results[name] = fn(args.updates)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({k: v["evals"] for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
