#!/usr/bin/env python
"""TPU validation + benchmark of the fused full-env Pallas kernel.

Runs on the real chip (axon backend):

1. FED MODE, bit-exact: the same surgically diversified battery as
   ``validate_fused_full_cpu.py`` (shared via ``fused_full_common``) —
   replays coverage-biased legal action scripts through the actual
   ``pallas_call`` AND through the jitted jnp engine on the TPU; every
   packed state row must be equal on lanes that never autoreset
   (PARITY #B8: the kernel's reset deck shuffle deviates), rewards within
   1e-3 (f32 FMA/compile-mode tolerance), episode counts equal.
2. SAMPLING MODE, distribution: mean reward / episodes of the in-kernel
   hardware-PRNG policy vs mask-legal random stepping of the jnp engine.
3. Throughput at the bench shape (8192 envs x 256 steps, pipelined).

Writes docs/fused_full_tpu_validation.json and prints one line per check.
"""
import json
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
from fused_full_common import B, coverage, sample_legal, surgery

N_STEPS = 14
PRELUDE = 4


def fed_mode_check(t0, report):
    rng = np.random.default_rng(13)
    keys = jax.random.split(jax.random.key(0), B)
    st = jax.vmap(full_env.reset)(keys)
    step_j = jax.jit(jax.vmap(full_env.step_autoreset))
    mask_j = jax.jit(jax.vmap(full_env.action_mask))
    for _ in range(PRELUDE):
        a = sample_legal(np.asarray(mask_j(st)), rng)
        st, _, _ = step_j(st, jnp.asarray(a))
    st0 = surgery(st, rng)
    print(f"[{time.time()-t0:.0f}s] prelude+surgery done", flush=True)

    acts = np.zeros((N_STEPS, B), np.int32)
    s = st0
    rew = np.zeros(B, np.float32)
    eps = np.zeros(B, np.int32)
    ever_done = np.zeros(B, bool)
    rew_alive = np.zeros(B, np.float32)  # only pre-first-reset rewards compare
    for t in range(N_STEPS):
        acts[t] = sample_legal(np.asarray(mask_j(s)), rng)
        s, r, d = step_j(s, jnp.asarray(acts[t]))
        r = np.asarray(r)
        rew += r
        rew_alive += np.where(ever_done, 0.0, r)
        eps += np.asarray(d)
        ever_done |= np.asarray(d)
    ref = {k: np.asarray(v) for k, v in FF.pack_full_state(s).items()}
    print(f"[{time.time()-t0:.0f}s] engine replay done "
          f"(resets={int(ever_done.sum())})", flush=True)
    print(f"coverage: {coverage(acts)}", flush=True)

    out = FF.rollout_full_fused(0, B, N_STEPS, actions=acts, init_state=st0)
    got = {k: np.asarray(v) for k, v in FF.pack_full_state(out["state"]).items()}
    print(f"[{time.time()-t0:.0f}s] kernel fed rollout done", flush=True)

    alive = ~ever_done
    ok = True
    for name in ("cards", "ints", "rng"):
        a, b = ref[name], got[name]
        neq = (a != b) & alive[(None,) * (a.ndim - 1)]
        same = not neq.any()
        ok &= same
        print(f"{'OK ' if same else 'MISMATCH '}{name}"
              + ("" if same else f" ({int(neq.sum())} elems)"), flush=True)
        if not same:
            for w in np.argwhere(neq)[:6]:
                w = tuple(w)
                print(f"  {name}{list(w)}: ref={a[w]} got={b[w]}", flush=True)
    rdiff = np.abs(np.where(alive, rew_alive
                            - np.asarray(out["total_reward"]), 0.0))
    r_ok = bool((rdiff <= 1e-3).all())
    ok &= r_ok
    print(f"{'OK ' if r_ok else 'MISMATCH '}rewards "
          f"(max |diff| pre-reset {float(rdiff.max()):.2e})", flush=True)
    e_ok = bool((np.asarray(out["episodes"])[alive] == eps[alive]).all())
    ok &= e_ok
    print(f"{'OK ' if e_ok else 'MISMATCH '}episodes", flush=True)
    report["fed_bit_exact"] = bool(ok)
    report["fed_steps"] = N_STEPS
    report["fed_alive_lanes"] = int(alive.sum())
    report["fed_coverage"] = coverage(acts)
    report["fed_reward_maxdiff"] = float(rdiff.max())
    return ok


def sampling_check(t0, report):
    n_envs, n_steps = 8192, 256
    out = jax.device_get(FF.rollout_full_fused(1, n_envs, n_steps))
    mean_r = float(np.sum(out["total_reward"])) / n_envs
    eps = int(np.sum(out["episodes"]))
    print(f"[{time.time()-t0:.0f}s] sampling rollout done", flush=True)

    def jnp_rollout(key):
        ks, ka = jax.random.split(key)
        states = jax.vmap(full_env.reset)(jax.random.split(ks, n_envs))

        def body(carry, k):
            sts, tot, ep = carry
            mask = jax.vmap(full_env.action_mask)(sts)
            logits = jnp.where(mask, 0.0, -jnp.inf)
            a = jax.random.categorical(k, logits)
            sts, r, d = jax.vmap(full_env.step_autoreset)(sts, a)
            return (sts, tot + r.sum(), ep + d.sum()), None

        (_, tot, ep), _ = jax.lax.scan(
            body, (states, jnp.float32(0), jnp.int32(0)),
            jax.random.split(ka, n_steps))
        return tot, ep

    tot, ep = jax.jit(jnp_rollout)(jax.random.key(1))
    jmean, jeps = float(tot) / n_envs, int(ep)
    print(json.dumps({"fused_mean_reward": round(mean_r, 3),
                      "jnp_mean_reward": round(jmean, 3),
                      "fused_episodes": eps, "jnp_episodes": jeps}), flush=True)
    report["sampling"] = {"fused_mean_reward": mean_r, "jnp_mean_reward": jmean,
                          "fused_episodes": eps, "jnp_episodes": jeps}
    # loose distribution agreement (policies are distinct PRNGs)
    return (abs(mean_r - jmean) / max(1.0, abs(jmean)) < 0.05
            and abs(eps - jeps) / max(1, jeps) < 0.10)


def throughput(t0, report):
    n_envs, n_steps, reps = 8192, 256, 8
    n_tiles = n_envs // FF.TILE
    f = lambda s: FF.rollout_full_fused(s, n_envs, n_steps)
    tc = time.perf_counter()
    float(f(2)["total_reward"][0])
    compile_s = time.perf_counter() - tc
    best = float("inf")
    seed = 3
    for _ in range(3):
        tc = time.perf_counter()
        for _ in range(reps):
            out = f(seed)
            seed += n_tiles
        float(out["total_reward"][0])  # data fetch = true sync on axon
        best = min(best, time.perf_counter() - tc)
    tput = reps * n_envs * n_steps / best
    print(json.dumps({"n_envs": n_envs, "full_env_steps_per_s": round(tput),
                      "compile_s": round(compile_s, 1)}), flush=True)
    report["throughput_steps_per_s"] = tput
    report["throughput_compile_s"] = compile_s
    return tput


def main():
    t0 = time.time()
    report = {"device": str(jax.devices()[0])}
    print(json.dumps({"device": report["device"]}), flush=True)
    ok = fed_mode_check(t0, report)
    dist_ok = sampling_check(t0, report)
    report["sampling_ok"] = bool(dist_ok)
    throughput(t0, report)
    os.makedirs("docs", exist_ok=True)
    with open("docs/fused_full_tpu_validation.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print("PASS" if (ok and dist_ok) else "FAIL", flush=True)
    sys.exit(0 if (ok and dist_ok) else 1)


if __name__ == "__main__":
    main()
