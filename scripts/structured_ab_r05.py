#!/usr/bin/env python
"""Round-5 structured-vs-flat A/B AT FUSED SPEED (r04 verdict item 5).

The r04 A/B ran on the ~10x-slower jnp path at 131M steps/arm because the
fused feature-major collection only supported the flat MLP; the default
stayed flat "partly for plumbing reasons, not evidence". Round 5 added
``ops.fused_policy_rollout.policy_apply_structured_fm`` (the 3-branch
extractor MXU-transposed), so both nets now train through
``PPOConfig(fused_rollout=True)`` — this re-runs the A/B at >=1B env steps
per arm with the e4 recipe and the cap-4096 eval protocol.

Arms (identical hyperparams, seeds, budget):
  flat        — ActorCritic(256, 256), ~130k params (the default)
  structured  — StructuredActorCritic, ~491k params (reference-faithful
                3-branch, train_balatro_agent.py:42-119)

Writes docs/structured_ab_r05.json. Run on the TPU.
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
                   "docs", "structured_ab_r05.json")


def run(tag, structured, updates, seed):
    hooks = full_env_hooks()
    cfg = PPOConfig(n_envs=8192, rollout_len=64, epochs=4, minibatches=4,
                    fused_rollout=True, bf16_compute=True, env_shuffle=True,
                    total_updates=updates, ent_coef_final=5e-4, lr_final=5e-5,
                    structured_net=structured)
    init_fn, update_fn, policy_fn = make_ppo(hooks, cfg)
    step = jax.jit(update_fn, donate_argnums=(0,))
    ts = init_fn(jax.random.key(seed))
    curve = []
    t0 = time.time()
    for i in range(updates):
        ts, m = step(ts)
        if (i + 1) % 250 == 0:
            row = {"update": i + 1,
                   "mean_reward": round(float(m["mean_reward"]), 3),
                   "entropy": round(float(m["entropy"]), 3)}
            curve.append(row)
            print(f"[{tag}] {row}", flush=True)
    jax.block_until_ready(ts.params)
    wall = time.time() - t0
    n_params = sum(x.size for x in jax.tree.leaves(ts.params))

    evals = {}
    for mode, kw in (("sampled_t1.0", dict(greedy=False, temperature=1.0)),
                     ("sampled_t0.4", dict(greedy=False, temperature=0.4)),
                     ("greedy_antiloop", dict(greedy=True))):
        evals[mode] = evaluate_policy(
            policy_fn, ts.params, hooks, n_episodes=512, max_steps=4096,
            seed=123, obs_stats=ts.obs_stats, **kw)
        print(f"[{tag}] {mode}: {evals[mode]}", flush=True)
    return {"tag": tag, "structured": structured, "updates": updates,
            "env_steps": updates * cfg.n_envs * cfg.rollout_len,
            "params": int(n_params), "wall_s": round(wall, 1),
            "train_steps_per_sec": round(
                updates * cfg.n_envs * cfg.rollout_len / wall),
            "curve": curve, "evals": evals}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=2000)  # 1.05B steps/arm
    args = ap.parse_args()
    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    for tag, structured in (("flat", False), ("structured", True)):
        results[tag] = run(tag, structured, args.updates, seed=1)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({k: {m: e.get("mean_ante") for m, e in v["evals"].items()}
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
