#!/usr/bin/env python
"""Bit-exact CPU validation: fused full-env kernel vs the jnp engine.

Replays per-env fed-action scripts through BOTH
``ops/fused_full_rollout.rollout_full_rows`` (the kernel's exact arithmetic
as plain XLA — same program Mosaic compiles on the TPU) and
``engine/full_env.step_autoreset``, from the same surgically diversified
start state, and diffs every packed state row / reward / done flag PER STEP.

Comparisons hold on lanes that have not yet autoreset (the kernel's reset
deck shuffle is the one sanctioned deviation — PARITY.md #B8): a lane is
excluded from step t+1 onward once its reference ``done`` fired at step t
(its kernel state is then resynced from the reference so later steps keep
comparing).

All integer state must be BIT-EXACT. Rewards compare at atol 1e-4: XLA
contracts the f32 reward-shaping mul+add chains into FMAs under jit but not
in eager/per-op execution, a 1-2 ulp compile-mode artifact (verified by
jitting vs disable_jit-ing the same formula).

x64 must be OFF (the kernel mirrors the f32/i32 production configuration),
so this runs out-of-process from the x64 pytest suite;
tests/test_fused_full_rollout.py invokes it via subprocess.

Modes:
  --mode eager     run the kernel arithmetic with jax.disable_jit() —
                   no XLA compile of the giant step body (~13 s/step).
  --mode compiled  jit the one-step body once and reuse (XLA:CPU compile of
                   the step body is pathologically slow; eager is default).

Exit 0 = every compared element within contract.
"""
import argparse
import contextlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_backend_optimization_level=0")

import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from balatro_gym_tpu.engine import full_env  # noqa: E402
from balatro_gym_tpu.ops import fused_full_rollout as FF  # noqa: E402
from fused_full_common import B, coverage, sample_legal, surgery  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--prelude", type=int, default=4)
    ap.add_argument("--mode", choices=("eager", "compiled"), default="eager")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    t0 = time.time()
    rng = np.random.default_rng(args.seed + 13)

    keys = jax.random.split(jax.random.key(args.seed), B)
    st = jax.vmap(full_env.reset)(keys)
    step_j = jax.jit(jax.vmap(full_env.step_autoreset))
    mask_j = jax.jit(jax.vmap(full_env.action_mask))

    # Legal random prelude scatters envs across phases before surgery.
    for _ in range(args.prelude):
        a = sample_legal(np.asarray(mask_j(st)), rng)
        st, _, _ = step_j(st, jnp.asarray(a))
    st0 = surgery(st, rng)
    jax.block_until_ready(st0.ante)
    print(f"[{time.time()-t0:.0f}s] prelude+surgery done; phases: "
          f"{np.bincount(np.asarray(st0.phase), minlength=4).tolist()}",
          flush=True)

    # ---- reference: per-step engine states + coverage-biased actions ----
    acts = np.zeros((args.steps, B), np.int32)
    ref_packed = []
    ref_rew = np.zeros((args.steps, B), np.float32)
    ref_done = np.zeros((args.steps, B), bool)
    s = st0
    for t in range(args.steps):
        acts[t] = sample_legal(np.asarray(mask_j(s)), rng)
        s, r, d = step_j(s, jnp.asarray(acts[t]))
        ref_packed.append({k: np.asarray(v)
                           for k, v in FF.pack_full_state(s).items()})
        ref_rew[t] = np.asarray(r)
        ref_done[t] = np.asarray(d)
    print(f"[{time.time()-t0:.0f}s] engine replay done "
          f"(dones={int(ref_done.sum())})", flush=True)
    print(f"coverage: {coverage(acts)}", flush=True)

    # ---- kernel arithmetic, one step at a time ----
    ctx = jax.disable_jit() if args.mode == "eager" else contextlib.nullcontext()
    fails = 0
    alive = np.ones(B, bool)
    ks = st0
    with ctx:
        for t in range(args.steps):
            out = FF.rollout_full_rows(ks, acts[t:t + 1], 1)
            ks = out["state"]
            got = {k: np.asarray(v)
                   for k, v in FF.pack_full_state(ks).items()}
            got_r = np.asarray(out["total_reward"])
            got_d = np.asarray(out["episodes"]) > 0

            # State of a lane whose episode ENDED this step is its autoreset
            # state — the reset shuffle deviates by design (PARITY #B8), so
            # state comparison excludes lanes at their done step; reward and
            # done (produced pre-reset) still compare on `alive`.
            st_alive = alive & ~ref_done[t]
            for name in ("cards", "ints", "rng"):
                a, b = ref_packed[t][name], got[name]
                lane = st_alive[(None,) * (a.ndim - 1)]
                neq = (a != b) & lane
                if neq.any():
                    idx = np.argwhere(neq)
                    rows = np.unique(idx[:, 0])[:8]
                    print(f"step {t} {name}: {neq.sum()} mismatches, "
                          f"rows {rows.tolist()}", flush=True)
                    for w_ in idx[:6]:
                        w_ = tuple(w_)
                        print(f"  {name}{list(w_)}: ref={a[w_]} got={b[w_]} "
                              f"act={acts[t, w_[-1]]}", flush=True)
                    fails += 1
            # Rewards: tiny tolerance — jit-mode FMA contraction (docstring).
            rneq = (np.abs(ref_rew[t] - got_r) > 1e-4) & alive
            if rneq.any():
                w_ = np.argwhere(rneq)[0][0]
                print(f"step {t} reward: {rneq.sum()} mismatches, env {w_}: "
                      f"ref={ref_rew[t, w_]} got={got_r[w_]} "
                      f"act={acts[t, w_]}", flush=True)
                fails += 1
            dneq = (ref_done[t] != got_d) & alive
            if dneq.any():
                w_ = np.argwhere(dneq)[0][0]
                print(f"step {t} done: {dneq.sum()} mismatches, env {w_} "
                      f"act={acts[t, w_]}", flush=True)
                fails += 1
            alive &= ~ref_done[t]
            print(f"[{time.time()-t0:.0f}s] step {t} compared "
                  f"(alive={int(alive.sum())})", flush=True)
            if fails >= 12:
                print("too many failures; stopping early", flush=True)
                break
            # Resync reset lanes from the reference so later steps keep
            # comparing (reset shuffles deviate by design, PARITY #B8).
            # Merge in packed space — plain int arrays, PRNG keys included
            # as raw words.
            if (~alive).any():
                dead = ~alive
                merged = {
                    k2: np.where(dead[(None,) * (v2.ndim - 1)],
                                 ref_packed[t][k2], v2)
                    for k2, v2 in got.items()}
                ks = FF.unpack_full_state(
                    {k2: jnp.asarray(v2) for k2, v2 in merged.items()})

    print("OK" if fails == 0 else f"FAILED ({fails} groups)", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
