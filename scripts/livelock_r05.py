#!/usr/bin/env python
"""Round-5 train-time livelock treatment (r04 verdict item 7).

The r04 negative result: a 1-step ``repeat_penalty`` does not stop plain
argmax livelock (2-cycles evade it; docs/ROUND4.md §6). Round 5's
``PPOConfig.cycle_penalty`` is the train-time twin of the #B13 eval mask —
a per-lane bitset of actions taken since the last positive-reward step;
re-taking one while scoreless is penalized, so cycles of ANY length pay
(a cycle must re-enter its own action set without scoring).

Trains the e4 recipe with cycle_penalty arms, then evaluates each with
PLAIN argmax (greedy=True, greedy_antiloop=False — no #B13 mask), the
antiloop reference point, and sampled T=0.25. Success = plain argmax
completes all 512 episodes at cap 4096 and scores >= the T=0.25 number.

Writes docs/livelock_r05.json. Run on the TPU.
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
                   "docs", "livelock_r05.json")


def run(tag, cycle_penalty, updates, seed):
    hooks = full_env_hooks()
    cfg = PPOConfig(n_envs=8192, rollout_len=64, epochs=4, minibatches=4,
                    fused_rollout=True, bf16_compute=True, env_shuffle=True,
                    total_updates=updates, ent_coef_final=5e-4, lr_final=5e-5,
                    cycle_penalty=cycle_penalty)
    init_fn, update_fn, policy_fn = make_ppo(hooks, cfg)
    step = jax.jit(update_fn, donate_argnums=(0,))
    ts = init_fn(jax.random.key(seed))
    t0 = time.time()
    curve = []
    for i in range(updates):
        ts, m = step(ts)
        if (i + 1) % 500 == 0:
            row = {"update": i + 1,
                   "mean_reward": round(float(m["mean_reward"]), 3),
                   "entropy": round(float(m["entropy"]), 3)}
            curve.append(row)
            print(f"[{tag}] {row}", flush=True)
    jax.block_until_ready(ts.params)
    wall = time.time() - t0

    evals = {}
    for mode, kw in (
            ("greedy_plain", dict(greedy=True, greedy_antiloop=False)),
            ("greedy_antiloop", dict(greedy=True, greedy_antiloop=True)),
            ("sampled_t0.25", dict(greedy=False, temperature=0.25))):
        evals[mode] = evaluate_policy(
            policy_fn, ts.params, hooks, n_episodes=512, max_steps=4096,
            seed=123, obs_stats=ts.obs_stats, **kw)
        print(f"[{tag}] {mode}: {evals[mode]}", flush=True)
    plain = evals["greedy_plain"]
    verdict = (plain["episodes"] == 512
               and plain.get("mean_ante", 0) >= evals["sampled_t0.25"].get(
                   "mean_ante", 0))
    return {"tag": tag, "cycle_penalty": cycle_penalty, "updates": updates,
            "wall_s": round(wall, 1), "curve": curve, "evals": evals,
            "plain_argmax_ok": bool(verdict)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=2000)
    args = ap.parse_args()
    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    for tag, cp in (("cp0.01_postnorm", 0.01), ("cp0.03_postnorm", 0.03)):
        results[tag] = run(tag, cp, args.updates, seed=1)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({k: {"plain_ok": v["plain_argmax_ok"],
                          "plain_ante": v["evals"]["greedy_plain"].get("mean_ante"),
                          "plain_episodes": v["evals"]["greedy_plain"]["episodes"],
                          "t025_ante": v["evals"]["sampled_t0.25"].get("mean_ante")}
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
