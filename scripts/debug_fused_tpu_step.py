#!/usr/bin/env python
"""Single-step three-way bisect of the fused full-env kernel on TPU.

For every step t of the validation battery (same prelude/surgery/action
script as validate_fused_full_tpu.py), runs ONE step from the ENGINE's
state at t through:
  (a) the jnp engine (jitted, TPU),
  (b) the kernel arithmetic as plain XLA (rollout_full_rows, jitted, TPU),
  (c) the real pallas_call (rollout_full_fused, TPU),
and diffs the packed states. Because each step restarts from the engine
state, divergence cannot cascade — the report names the exact (step, env,
row) where each formulation first disagrees, plus the action/phase.

Usage: python scripts/debug_fused_tpu_step.py [--steps N] [--prelude K]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.engine import full_env
from balatro_gym_tpu.ops import fused_full_rollout as FF
from fused_full_common import B, sample_legal, surgery

ROWNAMES = {}
for name in dir(FF):
    if name.startswith("S_"):
        ROWNAMES[getattr(FF, name)] = name
for base, cnt, label in ((FF.R_HIDX, 10, "hand_idx"), (FF.R_SEL, 8, "sel"),
                         (FF.R_FD, 8, "face_down"), (FF.R_JOK, 5, "joker"),
                         (FF.R_CONS, 5, "cons"), (FF.R_STY, 10, "shop_type"),
                         (FF.R_SIT, 10, "shop_item"), (FF.R_SCO, 10, "shop_cost"),
                         (FF.R_LVL, 12, "level"), (FF.R_PC, 12, "playcount")):
    for i in range(cnt):
        ROWNAMES.setdefault(base + i, f"{label}[{i}]")


def pk(st):
    return {k: np.asarray(v) for k, v in FF.pack_full_state(st).items()}


def diff(tag, t, a, b, live, acts_t, phases, limit=6):
    bad = False
    for name in ("cards", "ints", "rng"):
        x, y = a[name], b[name]
        neq = (x != y) & live[(None,) * (x.ndim - 1)]
        if neq.any():
            bad = True
            idx = np.argwhere(neq)
            envs = sorted(set(int(i[-1]) for i in idx))[:4]
            print(f"  [{tag}] step {t} {name}: {neq.sum()} elems, envs {envs}")
            for i in idx[:limit]:
                env = int(i[-1])
                row = (ROWNAMES.get(int(i[0]), str(int(i[0])))
                       if name == "ints" else tuple(int(v) for v in i[:-1]))
                print(f"    env={env} act={int(acts_t[env])} "
                      f"phase={int(phases[env])} {name}[{row}] "
                      f"a={x[tuple(i)]} b={y[tuple(i)]}")
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=14)
    ap.add_argument("--prelude", type=int, default=4)
    args = ap.parse_args()
    t0 = time.time()

    rng = np.random.default_rng(13)
    keys = jax.random.split(jax.random.key(0), B)
    st = jax.vmap(full_env.reset)(keys)
    step_j = jax.jit(jax.vmap(full_env.step_autoreset))
    mask_j = jax.jit(jax.vmap(full_env.action_mask))
    for _ in range(args.prelude):
        a = sample_legal(np.asarray(mask_j(st)), rng)
        st, _, _ = step_j(st, jnp.asarray(a))
    st = surgery(st, rng)
    print(f"[{time.time()-t0:.0f}s] prelude+surgery done", flush=True)

    bad_steps = 0
    for t in range(args.steps):
        acts_t = sample_legal(np.asarray(mask_j(st)), rng)
        phases = np.asarray(st.phase)
        nxt, _, d = step_j(st, jnp.asarray(acts_t))
        live = ~np.asarray(d)  # autoreset lanes excluded (#B8 shuffle)
        ref = pk(nxt)

        a1 = jnp.asarray(acts_t)[None, :]
        rows = FF.rollout_full_rows(st, a1, 1)
        kern = FF.rollout_full_fused(0, B, 1, actions=a1, init_state=st)
        got_rows = pk(rows["state"])
        got_kern = pk(kern["state"])

        b1 = diff("rows-vs-engine", t, ref, got_rows, live, acts_t, phases)
        b2 = diff("kern-vs-rows", t, got_rows, got_kern, live, acts_t, phases)
        if b1 or b2:
            bad_steps += 1
        else:
            print(f"[{time.time()-t0:.0f}s] step {t} OK", flush=True)
        st = nxt
        if bad_steps >= 4:
            break
    print("DONE" if bad_steps == 0 else f"BAD steps: {bad_steps}")


if __name__ == "__main__":
    main()
