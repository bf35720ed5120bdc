#!/usr/bin/env python
"""TPU validation + benchmark of the policy-driven fused collection path.

Runs on the real chip (axon backend):

1. FED single-step battery: from surgically diversified states, the actual
   ``step_tiles`` pallas_call steps 8 times on engine-chosen legal random
   actions, side-by-side with the jitted jnp engine. Packed state rows must
   be bit-equal on lanes that never autoreset (PARITY #B8 reset-shuffle
   deviation), rewards within 1e-3 (f32 FMA/compile-mode), dones equal, the
   mask block exactly equal to ``vmap(action_mask)``, and the obs block
   within 5e-6 of ``vmap(observe_vector)`` (Mosaic vs XLA transcendental
   ulps on the log1p feature; all other features compare exactly).
2. DISTRIBUTION: mean reward of fused policy-in-the-loop collection vs the
   jnp-engine policy rollout with the SAME ActorCritic params (independent
   PRNG streams) at 8192 envs x 64 steps.
3. THROUGHPUT: fused collection at 8192 envs x 256 steps (pipelined,
   data-fetch sync), vs the jnp policy-collection path — the number that
   bounds PPO's env side (train/ppo.py fused_rollout=True).

Writes docs/policy_collect_tpu_validation.json.
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
from balatro_gym_tpu.ops import fused_policy_rollout as FP
from balatro_gym_tpu.train.networks import ActorCritic
from fused_full_common import B, coverage, sample_legal, surgery

N_STEPS = 8
PRELUDE = 4


def _params(key=1, hidden=(256, 256)):
    net = ActorCritic(n_actions=FP.N_ACTIONS, hidden=hidden)
    return net.init(jax.random.key(key), jnp.zeros((1, FP.OBS_DIM)),
                    jnp.ones((1, FP.N_ACTIONS), bool))


def fed_mode_check(t0, report):
    rng = np.random.default_rng(13)
    st = jax.vmap(full_env.reset)(jax.random.split(jax.random.key(0), B))
    step_j = jax.jit(jax.vmap(full_env.step_autoreset))
    mask_j = jax.jit(jax.vmap(full_env.action_mask))
    obs_j = jax.jit(jax.vmap(full_env.observe_vector))
    for _ in range(PRELUDE):
        a = sample_legal(np.asarray(mask_j(st)), rng)
        st, _, _ = step_j(st, jnp.asarray(a))
    st = surgery(st, rng)
    print(f"[{time.time()-t0:.0f}s] prelude+surgery done", flush=True)

    cards, ints, rgp = FP.tile_packed(FP.pack_full_state(st))
    n_tiles = ints.shape[1]
    ok = True
    ever_done = np.zeros(B, bool)
    acts_all = np.zeros((N_STEPS, B), np.int32)
    obs_maxdiff = 0.0
    for t in range(N_STEPS):
        a = sample_legal(np.asarray(mask_j(st)), rng)
        acts_all[t] = a
        st, r_ref, d_ref = step_j(st, jnp.asarray(a))
        cards, ints, rgp, rew, done, obs, mask = FP.step_tiles(
            cards, ints, rgp, FP.unflat_fm(jnp.asarray(a)[None], n_tiles))
        got = {k: np.asarray(v)
               for k, v in FP.untile_packed(cards, ints, rgp).items()}
        ref = {k: np.asarray(v) for k, v in FP.pack_full_state(st).items()}
        alive = ~(ever_done | np.asarray(d_ref))  # state cmp excludes resets
        for name in ("cards", "ints", "rng"):
            neq = (ref[name] != got[name]) & alive[(None,) * (ref[name].ndim - 1)]
            if neq.any():
                ok = False
                print(f"step {t} MISMATCH {name} ({int(neq.sum())})", flush=True)
                for w in np.argwhere(neq)[:4]:
                    w = tuple(w)
                    print(f"  {name}{list(w)}: ref={ref[name][w]} "
                          f"got={got[name][w]} act={a[w[-1]]}", flush=True)
        lane_alive = ~ever_done
        rdiff = np.abs(np.where(lane_alive,
                                np.asarray(r_ref)
                                - np.asarray(FP.flat_fm(rew))[0], 0.0))
        if rdiff.max() > 1e-3:
            ok = False
            print(f"step {t} MISMATCH reward (max {rdiff.max():.2e})", flush=True)
        dneq = (np.asarray(d_ref) != (np.asarray(FP.flat_fm(done))[0] != 0)) \
            & lane_alive
        if dneq.any():
            ok = False
            print(f"step {t} MISMATCH done ({int(dneq.sum())})", flush=True)
        # obs/mask of the post-step state (autoreset lanes included — the
        # kernel's own reset state is what its obs must describe, so compare
        # those against the engine view of the KERNEL's post state).
        post = FF.unpack_full_state({k: jnp.asarray(v) for k, v in got.items()})
        oref = np.asarray(obs_j(post), np.float32)
        mref = np.asarray(mask_j(post))
        od = np.abs(oref - np.asarray(FP.flat_fm(obs)).T)
        obs_maxdiff = max(obs_maxdiff, float(od.max()))
        if od.max() > 5e-6:
            ok = False
            w = tuple(np.argwhere(od > 5e-6)[0])
            print(f"step {t} MISMATCH obs (max {od.max():.2e} at {list(w)})",
                  flush=True)
        mneq = mref != (np.asarray(FP.flat_fm(mask)).T != 0)
        if mneq.any():
            ok = False
            print(f"step {t} MISMATCH mask ({int(mneq.sum())})", flush=True)
        ever_done |= np.asarray(d_ref)
        print(f"[{time.time()-t0:.0f}s] step {t} compared "
              f"(alive={int((~ever_done).sum())})", flush=True)

    print(f"coverage: {coverage(acts_all)}", flush=True)
    print(("OK " if ok else "MISMATCH ")
          + f"fed battery (obs max|diff| {obs_maxdiff:.2e})", flush=True)
    report["fed_bit_exact"] = bool(ok)
    report["fed_steps"] = N_STEPS
    report["fed_obs_maxdiff"] = obs_maxdiff
    report["fed_coverage"] = coverage(acts_all)
    return ok


def _jnp_policy_rollout(params, n_envs, n_steps):
    net = ActorCritic(n_actions=FP.N_ACTIONS)

    def rollout(key):
        ks, ka = jax.random.split(key)
        states = jax.vmap(full_env.reset)(jax.random.split(ks, n_envs))

        def body(carry, k):
            sts, tot, ep = carry
            obs = jax.vmap(full_env.observe_vector)(sts)
            mask = jax.vmap(full_env.action_mask)(sts)
            logits, _ = net.apply(params, obs, mask)
            a = jax.random.categorical(k, logits)
            sts, r, d = jax.vmap(full_env.step_autoreset)(sts, a)
            return (sts, tot + r.sum(), ep + d.sum()), None

        (_, tot, ep), _ = jax.lax.scan(
            body, (states, jnp.float32(0), jnp.int32(0)),
            jax.random.split(ka, n_steps))
        return tot, ep

    return jax.jit(rollout)


def distribution_check(t0, report, params):
    n_envs, n_steps = 8192, 64
    st0 = jax.vmap(full_env.reset)(jax.random.split(jax.random.key(2), n_envs))
    _, traj = FP.collect_policy_fused(params, st0, jax.random.key(3), n_steps)
    f_mean = float(np.asarray(traj["reward"]).sum()) / n_envs
    f_eps = int(np.asarray(traj["done"]).sum())
    print(f"[{time.time()-t0:.0f}s] fused policy collect done", flush=True)
    tot, ep = _jnp_policy_rollout(params, n_envs, n_steps)(jax.random.key(3))
    j_mean, j_eps = float(tot) / n_envs, int(ep)
    print(json.dumps({"fused_mean_reward": round(f_mean, 3),
                      "jnp_mean_reward": round(j_mean, 3),
                      "fused_episodes": f_eps, "jnp_episodes": j_eps}),
          flush=True)
    report["distribution"] = {
        "fused_mean_reward": f_mean, "jnp_mean_reward": j_mean,
        "fused_episodes": f_eps, "jnp_episodes": j_eps,
        "n_envs": n_envs, "n_steps": n_steps}
    return (abs(f_mean - j_mean) / max(1.0, abs(j_mean)) < 0.05
            and abs(f_eps - j_eps) / max(1, j_eps) < 0.10)


def throughput(t0, report, params):
    n_envs, n_steps, reps = 8192, 256, 4
    st0 = jax.vmap(full_env.reset)(jax.random.split(jax.random.key(4), n_envs))
    cards, ints, rgp = FP.tile_packed(FP.pack_full_state(st0))
    obs, mask = FP.observe_tiles(cards, ints, rgp)

    tc = time.perf_counter()
    carry, traj = FP._collect(params, cards, ints, rgp, obs, mask,
                              jax.random.key(5), n_steps)
    float(traj["reward"][0, 0])
    compile_s = time.perf_counter() - tc
    print(f"[{time.time()-t0:.0f}s] collect compiled+warm ({compile_s:.0f}s)",
          flush=True)
    best = float("inf")
    for i in range(3):
        tc = time.perf_counter()
        for r in range(reps):
            carry, traj = FP._collect(params, *carry,
                                      jax.random.key(10 + i * reps + r),
                                      n_steps)
        float(traj["reward"][0, 0])  # data fetch = true sync on axon
        best = min(best, time.perf_counter() - tc)
    tput = reps * n_envs * n_steps / best
    print(json.dumps({"n_envs": n_envs,
                      "policy_collect_steps_per_s": round(tput),
                      "compile_s": round(compile_s, 1)}), flush=True)
    report["collect_steps_per_s"] = tput
    report["collect_compile_s"] = compile_s

    # jnp policy-collection baseline (what PPO's env side did before).
    # SAME protocol as the fused number: warmed, best-of-3 samples with
    # `reps` pipelined rollouts per sample and a true data-fetch sync —
    # asymmetric methodology would bias the promoted speedup (ADVICE r3).
    # Scan length 64 instead of 256 (the jnp path compiles ~4x the program;
    # per-step throughput is scan-length-flat, verified by the fused path's
    # own 64-vs-256 agreement) — noted here because the ratio divides
    # numbers from different scan lengths.
    jnp_steps = 64
    fn = _jnp_policy_rollout(params, n_envs, jnp_steps)
    tot, _ = fn(jax.random.key(6))
    float(tot)  # compile + true sync
    jnp_best = float("inf")
    for i in range(3):
        tc = time.perf_counter()
        for r in range(reps):
            tot, _ = fn(jax.random.key(20 + i * reps + r))
        float(tot)  # data fetch = true sync on axon
        jnp_best = min(jnp_best, time.perf_counter() - tc)
    jnp_tput = reps * n_envs * jnp_steps / jnp_best
    print(json.dumps({"jnp_policy_collect_steps_per_s": round(jnp_tput),
                      "jnp_scan_len": jnp_steps,
                      "protocol": "best-of-3 x reps, same as fused"}),
          flush=True)
    report["jnp_collect_steps_per_s"] = jnp_tput
    report["speedup"] = tput / jnp_tput
    return tput


def main():
    t0 = time.time()
    report = {"device": str(jax.devices()[0])}
    print(json.dumps({"device": report["device"]}), flush=True)
    params = _params()
    ok = fed_mode_check(t0, report)
    dist_ok = distribution_check(t0, report, params)
    report["distribution_ok"] = bool(dist_ok)
    throughput(t0, report, params)
    os.makedirs("docs", exist_ok=True)
    with open("docs/policy_collect_tpu_validation.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print("PASS" if (ok and dist_ok) else "FAIL", flush=True)
    sys.exit(0 if (ok and dist_ok) else 1)


if __name__ == "__main__":
    main()
