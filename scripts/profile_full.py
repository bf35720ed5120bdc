#!/usr/bin/env python
"""Ablation profiler for the flagship full env + PPO update on TPU.

Variants time a 64-step, 8192-env random-legal-action rollout with pieces
stubbed, plus one PPO update timing per env. Uses data-fetch syncs (the
axon backend's block_until_ready can return before remote completion).

Usage: timeout 1800 python scripts/profile_full.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from balatro_gym_tpu.engine import full_env as fe
from balatro_gym_tpu.engine import consumable_logic as CL
from balatro_gym_tpu.ops import scoring

N_ENVS = 8192
N_STEPS = 64


def rollout(key, n_envs, n_steps):
    keys = jax.random.split(key, n_envs)
    states = jax.vmap(fe.reset)(keys)

    def one(st, k):
        mask = fe.action_mask(st)
        a = jax.random.categorical(k, jnp.where(mask, 0.0, -jnp.inf))
        return fe.step_autoreset(st, a)

    def body(carry, k):
        sts, tot = carry
        sts, rew, done = jax.vmap(one)(sts, jax.random.split(k, n_envs))
        return (sts, tot + jnp.sum(rew)), None

    (states, total), _ = jax.lax.scan(
        body, (states, jnp.zeros(())), jax.random.split(key, n_steps))
    return total


def timeit(name):
    # Fresh lambda per variant: jax caches traced jaxprs on function object
    # identity, so re-jitting the same global silently ignores monkeypatches.
    fn = jax.jit(lambda k: rollout(k, N_ENVS, N_STEPS))
    t0 = time.perf_counter()
    float(fn(jax.random.key(0)))  # compile + true sync
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        out = fn(jax.random.key(1 + i))
    float(out)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"variant": name, "steps_per_s": round(N_ENVS * N_STEPS / dt),
                      "ms_per_step": round(dt / N_STEPS * 1e3, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    timeit("baseline")

    # Stub the unified scorer.
    real = fe.score_env_unified

    def stub_score(ranks, suits, valid, enh, ed, levels, jokers, hl, dl, ds, key):
        return jnp.sum(jnp.where(valid, ranks, 0)).astype(jnp.int64) * 8, jnp.int32(0)

    fe.score_env_unified = stub_score
    try:
        timeit("stub_score")
    finally:
        fe.score_env_unified = real

    # Stub consumables (52-effect switch).
    real_cons = CL.use_consumable
    CL_use = fe.CL.use_consumable

    def stub_cons(st, idx):
        return st, jnp.zeros((), jnp.float64)

    fe.CL.use_consumable = stub_cons
    try:
        timeit("stub_consumables")
    finally:
        fe.CL.use_consumable = real_cons

    # Stub the shop phase entirely.
    real_shop = fe._step_shop_phase

    def stub_shop(st, action):
        return st.replace(phase=jnp.int32(1)), jnp.zeros((), jnp.float64), jnp.zeros((), bool)

    fe._step_shop_phase = stub_shop
    try:
        timeit("stub_shop_phase")
    finally:
        fe._step_shop_phase = real_shop

    # Stub boss logic inside play.
    real_draw = fe.B.on_hand_drawn

    def stub_drawn(k, bid, first, ranks, present):
        z = jnp.zeros(ranks.shape, bool)
        return z, z

    fe.B.on_hand_drawn = stub_drawn
    try:
        timeit("stub_boss_drawn")
    finally:
        fe.B.on_hand_drawn = real_draw

    # Stub the play phase's _advance_round (shop regen on every play).
    real_adv = fe._advance_round
    fe._advance_round = lambda st: st.replace(phase=jnp.int32(1))
    try:
        timeit("stub_advance_round")
    finally:
        fe._advance_round = real_adv


if __name__ == "__main__":
    main()
