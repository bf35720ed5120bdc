#!/usr/bin/env python
"""Ablation profiler for the sim-engine rollout (scripts/profile_sim.py).

Times the 8192-env random rollout on the default backend with pieces of the
step stubbed out, to locate where per-step time goes:

  baseline      full bench configuration (what bench.py measures)
  const_action  skip mask+categorical action sampling (fixed action 4)
  stub_score    score_sim replaced by a trivial constant pipeline
  stub_eval     evaluate_sim (hand classification) replaced by constants
  no_jokers     empty joker slots (joker pass on zero multi-hot)

Usage: timeout 1800 python scripts/profile_sim.py [n_steps]
Prints one JSON line per variant with steps/s.
"""
from __future__ import annotations

import json
import os
import sys
import time

# Self-insert the repo root: PYTHONPATH breaks the site hook that registers
# the axon TPU backend, so scripts must fix sys.path themselves.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from balatro_gym_tpu.engine import sim_env
from balatro_gym_tpu.ops import scoring

N_ENVS = 8192
N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
JOKERS = (1, 31, 34, 48, 72)


def time_rollout(name, rollout_fn, jokers=JOKERS):
    # Fresh lambda per variant: jax caches traced jaxprs on function object
    # identity, so re-jitting the same global silently ignores monkeypatches.
    # Sync via data fetch: the axon backend's block_until_ready can return
    # before remote execution completes.
    fn = jax.jit(lambda k: rollout_fn(k, N_ENVS, N_STEPS, jokers))
    t0 = time.perf_counter()
    out = fn(jax.random.key(0))
    jax.device_get(out)
    compile_s = time.perf_counter() - t0
    reps, best = 3, float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn(jax.random.key(1 + i))
        jax.device_get(out)
        best = min(best, time.perf_counter() - t0)
    sps = N_ENVS * N_STEPS / best
    print(json.dumps({"variant": name, "steps_per_s": round(sps),
                      "ms_per_step": round(best / N_STEPS * 1e3, 4),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return sps


def rollout_const_action(key, n_envs, n_steps, jokers):
    keys = jax.random.split(key, n_envs)
    jok = jnp.broadcast_to(jnp.asarray(jokers, jnp.int32), (n_envs, 5))
    states = jax.vmap(sim_env.reset)(keys, jok)

    def body(carry, k):
        sts, tot = carry
        sts, rew, done = jax.vmap(sim_env.step_autoreset, (0, None))(sts, jnp.int32(4))
        return (sts, tot + jnp.sum(rew)), None

    (states, total), _ = jax.lax.scan(
        body, (states, jnp.zeros((), jnp.float64)),
        jax.random.split(jax.random.fold_in(key, 1), n_steps))
    return states, total


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}), flush=True)

    time_rollout("baseline", sim_env.rollout_random)
    time_rollout("const_action", rollout_const_action)
    time_rollout("no_jokers", sim_env.rollout_random, jokers=(0, 0, 0, 0, 0))

    real_score = sim_env.score_sim

    def stub_score(ranks, suits, valid, enh, ed, seal, base_value, jokers,
                   hands_left, discards_left, deck_size, key):
        delta = jnp.sum(jnp.where(valid, base_value, 0)).astype(jnp.int64) * 8
        return delta, jnp.int32(0), jnp.int32(0), valid

    sim_env.score_sim = stub_score
    try:
        time_rollout("stub_score", sim_env.rollout_random)
    finally:
        sim_env.score_sim = real_score

    real_eval = scoring.evaluate_sim

    def stub_eval(ranks, suits, valid, ff=False, sc=False):
        return jnp.int32(0), valid

    scoring.evaluate_sim = stub_eval
    try:
        time_rollout("stub_eval", sim_env.rollout_random)
    finally:
        scoring.evaluate_sim = real_eval


if __name__ == "__main__":
    main()
