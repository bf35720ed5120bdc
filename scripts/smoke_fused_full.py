"""Smoke: fused full-env kernel (interpret, CPU, x64 OFF) vs jnp engine.

Runs a short fed-action script through both paths from the same reset state
and diffs every packed state row bit-exactly. Not a pytest file — the suite
forces x64 for reference parity; the kernel mirrors the x64-off production
configuration (see ops/fused_full_rollout.py module docstring).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

ACTIONS = [int(a) for a in sys.argv[1:]] or [45]
B = FF.TILE
n_steps = len(ACTIONS)

t0 = time.time()
keys = jax.random.split(jax.random.key(0), B)
st0 = jax.vmap(full_env.reset)(keys)
jax.block_until_ready(st0)
print(f"[{time.time()-t0:.0f}s] reset done", flush=True)

step_j = jax.jit(jax.vmap(full_env.step_autoreset, in_axes=(0, None)))
st = st0
tot = jnp.zeros(B, jnp.float32)
epi = jnp.zeros(B, jnp.int32)
for a in ACTIONS:
    st, r, d = step_j(st, jnp.int32(a))
    tot = tot + r
    epi = epi + d.astype(jnp.int32)
jax.block_until_ready(st)
print(f"[{time.time()-t0:.0f}s] jnp engine done", flush=True)

acts = np.broadcast_to(np.asarray(ACTIONS, np.int32)[:, None], (n_steps, B))
out = FF.rollout_full_rows(st0, acts, n_steps)
jax.block_until_ready(out["state"])
print(f"[{time.time()-t0:.0f}s] kernel-rows done", flush=True)

ref = FF.pack_full_state(st)
got = FF.pack_full_state(out["state"])

fails = 0
for name in ("cards", "ints", "rng"):
    a, b = np.asarray(ref[name]), np.asarray(got[name])
    if a.shape != b.shape:
        print(f"{name}: SHAPE {a.shape} vs {b.shape}")
        fails += 1
        continue
    neq = a != b
    if neq.any():
        rows = np.unique(np.argwhere(neq)[:, 0])
        print(f"{name}: {neq.sum()} mismatched elems, rows {rows[:20]}")
        for rix in rows[:6]:
            col = np.argwhere(neq[rix])[0]
            idx = (rix, *col)
            print(f"  {name}{list(idx)}: ref={a[idx]} got={b[idx]}")
        fails += 1

for name, a, b in (("total_reward", tot, out["total_reward"]),
                   ("episodes", epi, out["episodes"])):
    a, b = np.asarray(a), np.asarray(b)
    if (a != b).any():
        w = np.argwhere(a != b)[0]
        print(f"{name}: {np.sum(a != b)} mismatches, "
              f"first env {w}: ref={a[tuple(w)]} got={b[tuple(w)]}")
        fails += 1

print("OK" if fails == 0 else f"FAILED ({fails} groups)")
sys.exit(1 if fails else 0)
