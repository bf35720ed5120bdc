#!/usr/bin/env python
"""Four-way probe of one diverging env: engine/rows x TPU/CPU.

Reconstructs the validation battery's state at --step, extracts one env
(default: first env whose engine-vs-rows packed state differs on the
current backend), and prints per-row diffs for all four (formulation,
backend) combinations. Whichever formulation changes across backends is
the bug.
"""
import argparse
import os
import sys

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", type=int, default=0)
    ap.add_argument("--prelude", type=int, default=4)
    ap.add_argument("--env", type=int, default=-1)
    args = ap.parse_args()

    rng = np.random.default_rng(13)
    keys = jax.random.split(jax.random.key(0), B)
    st = jax.vmap(full_env.reset)(keys)
    step_j = jax.jit(jax.vmap(full_env.step_autoreset))
    mask_j = jax.jit(jax.vmap(full_env.action_mask))
    for _ in range(args.prelude):
        a = sample_legal(np.asarray(mask_j(st)), rng)
        st, _, _ = step_j(st, jnp.asarray(a))
    st = surgery(st, rng)
    for t in range(args.step):
        acts_t = sample_legal(np.asarray(mask_j(st)), rng)
        st, _, _ = step_j(st, jnp.asarray(acts_t))
    acts_t = sample_legal(np.asarray(mask_j(st)), rng)
    a1 = jnp.asarray(acts_t)[None, :]

    cpu = jax.devices("cpu")[0]
    results = {}
    for backend, dev in (("acc", None), ("cpu", cpu)):
        import contextlib
        ctx = jax.default_device(dev) if dev is not None else contextlib.nullcontext()
        with ctx:
            st_d = jax.device_put(st, dev) if dev is not None else st
            a_d = jax.device_put(a1, dev) if dev is not None else a1
            nxt, _, d = jax.jit(jax.vmap(full_env.step_autoreset))(st_d, a_d[0])
            # XLA:CPU hangs compiling the 2.4k-line rows step body — run it
            # per-op there, as validate_fused_full_cpu.py does.
            import contextlib as _cl
            nojit = jax.disable_jit() if backend == "cpu" else _cl.nullcontext()
            with nojit:
                rows = FF.rollout_full_rows(st_d, a_d, 1)
            results[("engine", backend)] = (pk(nxt), np.asarray(d))
            results[("rows", backend)] = (pk(rows["state"]), None)

    live = ~results[("engine", "acc")][1]
    env = args.env
    if env < 0:
        ref = results[("engine", "acc")][0]
        got = results[("rows", "acc")][0]
        for name in ("cards", "ints", "rng"):
            neq = (ref[name] != got[name]) & live[(None,) * (ref[name].ndim - 1)]
            if neq.any():
                env = int(np.argwhere(neq)[0][-1])
                break
    if env < 0:
        print("no divergence on this backend")
        return
    print(f"env={env} act={int(acts_t[env])} phase={int(np.asarray(st.phase)[env])} "
          f"boss={int(np.asarray(st.boss_id)[env])} "
          f"cons={np.asarray(st.cons)[env]} hand_n={int(np.asarray(st.hand_n)[env])}")

    combos = [("engine", "acc"), ("engine", "cpu"), ("rows", "acc"), ("rows", "cpu")]
    base = results[("engine", "cpu")][0]
    for name in ("cards", "ints", "rng"):
        rowset = set()
        for c in combos:
            x = results[c][0][name]
            neq = x[..., env] != base[name][..., env]
            rowset |= {tuple(i) for i in np.argwhere(neq)}
        for r in sorted(rowset):
            label = (ROWNAMES.get(r[0], str(r[0])) if name == "ints" else r)
            vals = " ".join(f"{c[0]}/{c[1]}={results[c][0][name][r + (env,)]}"
                            for c in combos)
            print(f"  {name}[{label}]: {vals}")


if __name__ == "__main__":
    main()
