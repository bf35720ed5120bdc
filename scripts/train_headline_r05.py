#!/usr/bin/env python
"""Round-5 headline-RL runs: fix the long-horizon collapse (r04 verdict #2).

The round-4 8k-update run (e4_decay recipe, 4.2B env steps) collapsed after
~update 3000 — entropy climbed back to 2.0 and training reward fell
(docs/ROUND4.md §6). Two things changed for round 5:

* ``PPOConfig.kl_target`` — SB3 ``target_kl`` semantics: per-minibatch
  Schulman approx-KL; once it exceeds the target the offending minibatch and
  everything after it this update are skipped (lax.cond, optimizer state
  untouched). Caps per-update policy divergence at its source.
* the env_shuffle minibatch fix (ADVICE r04 medium): the 4-epoch recipe now
  actually re-partitions minibatches per epoch along the permuted env axis;
  the r04 runs reused one fixed timestep-block partition 4x per update.

Runs (all e4 recipe: 8192 envs x rollout 64, 4 epochs, fused+bf16):
  base_8k  — the r04 recipe re-run with the shuffle fix only (does the
             collapse persist?)
  kl_8k    — + kl_target=0.015

Eval protocol is the r04 decode-grid headline: 512 episodes, cap 4096
(all episodes complete), sampled T=1.0/0.4/0.25 + greedy-antiloop.
Success (verdict Done=): final sampled T=1.0 mean peak ante >= 16.5 (the
r04 2k checkpoint's number under this protocol).

Writes docs/training_summary_headline_r05.json (+ curve rows with
approx_kl / kl_skipped) and a checkpoint per run under docs/ckpt_*_r05.

Run on the TPU: python scripts/train_headline_r05.py
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
from balatro_gym_tpu.utils.checkpoint import save_train_state

DOCS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "docs")
OUT = os.path.join(DOCS, "training_summary_headline_r05.json")


def run(tag, cfg, updates, seed, log_every=250):
    hooks = full_env_hooks()
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
                   "entropy": round(float(m["entropy"]), 3),
                   "approx_kl": round(float(m["approx_kl"]), 5),
                   "kl_skipped": round(float(m["kl_skipped"]), 3)}
            curve.append(row)
            print(f"[{tag}] {row}", flush=True)
    jax.block_until_ready(ts.params)
    wall = time.time() - t0

    save_train_state(os.path.join(DOCS, f"ckpt_{tag}_r05", "state"), ts)
    evals = {}
    for mode, kw in (("sampled_t1.0", dict(greedy=False, temperature=1.0)),
                     ("sampled_t0.4", dict(greedy=False, temperature=0.4)),
                     ("sampled_t0.25", dict(greedy=False, temperature=0.25)),
                     ("greedy_antiloop", dict(greedy=True))):
        evals[mode] = evaluate_policy(
            policy_fn, ts.params, hooks, n_episodes=512, max_steps=4096,
            seed=123, obs_stats=ts.obs_stats, **kw)
        print(f"[{tag}] {mode}: {evals[mode]}", flush=True)
    return {"tag": tag, "updates": updates, "seed": seed,
            "env_steps": updates * cfg.n_envs * cfg.rollout_len,
            "wall_s": round(wall, 1), "curve": curve, "evals": evals}


def e4(updates, **kw):
    return PPOConfig(n_envs=8192, rollout_len=64, epochs=4, minibatches=4,
                     fused_rollout=True, bf16_compute=True, env_shuffle=True,
                     total_updates=updates, ent_coef_final=5e-4,
                     lr_final=5e-5, **kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=8000)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    u = args.updates
    runs = {
        "base_8k": lambda: run("base_8k", e4(u), u, seed=1),
        "kl_8k": lambda: run("kl_8k", e4(u, kl_target=0.015), u, seed=1),
        # 2x the fixed-collapse horizon (8.4B env steps) with the KL
        # guardrail on: the stability stress artifact.
        "kl_16k": lambda: run("kl_16k", e4(16000, kl_target=0.015), 16000,
                              seed=1, log_every=500),
        # Schedule-isolation variant: same 16k updates but the decays run
        # over the first 8000 and HOLD their final values after (optax
        # linear_schedule clamps; the ent decay frac clips at 1) — tests
        # whether the kl_16k collapse is the STRETCHED schedule (high
        # entropy coef deep into the run) rather than the horizon itself.
        "hold_16k": lambda: run("hold_16k",
                                e4(8000, kl_target=0.015), 16000,
                                seed=1, log_every=500),
        # Episode-cap isolation: the SAME stretched schedule that collapsed
        # (kl_16k) plus the staggered per-lane time limit (32 updates x
        # rollout 64 = 2048-step cap, the reference's SafeBalatroEnv
        # order) — tests whether truncating wedged lanes alone prevents
        # the zero-reward collection collapse.
        "cap_16k": lambda: run("cap_16k",
                               e4(16000, kl_target=0.015,
                                  reset_envs_every=32), 16000,
                               seed=1, log_every=500),
    }
    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    for name, fn in runs.items():
        if args.only and name != args.only:
            continue
        results[name] = fn()
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({k: {m: e.get("mean_ante") for m, e in v["evals"].items()}
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
