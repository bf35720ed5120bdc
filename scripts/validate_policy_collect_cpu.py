#!/usr/bin/env python
"""CPU validation: policy-driven fused collection vs the proven kernel mirror.

Runs a short policy-in-the-loop collection with ``fused_policy_rollout``'s
plain-XLA mirrors (eager — XLA:CPU's compile of the step body is
pathological, see validate_fused_full_cpu.py), then replays the RECORDED
actions through ``fused_full_rollout.rollout_full_rows`` (the whole-rollout
kernel's arithmetic, itself bit-exact vs the jnp engine per
tests/test_fused_full_rollout.py) and asserts:

* per-step rewards and done flags bit-equal,
* the FINAL packed state (cards/ints/rng) bit-equal,
* per-step obs/mask rows bit-equal to vmap(observe_vector)/vmap(action_mask)
  of the unpacked post-step state.

x64 must be OFF (production f32/i32 config), so this runs out-of-process
from the x64 pytest suite (tests/test_fused_policy_rollout.py).
"""
import argparse
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
from balatro_gym_tpu.ops import fused_policy_rollout as FP  # noqa: E402
from balatro_gym_tpu.train.networks import ActorCritic  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    t0 = time.time()

    B = FP.TILE
    st0 = jax.vmap(full_env.reset)(jax.random.split(jax.random.key(args.seed), B))
    net = ActorCritic(n_actions=FP.N_ACTIONS)
    params = net.init(jax.random.key(1), jnp.zeros((1, FP.OBS_DIM)),
                      jnp.ones((1, FP.N_ACTIONS), bool))

    fails = 0
    with jax.disable_jit():
        cards, ints, rg = FP.tile_packed(FP.pack_full_state(st0))
        obs_fm, mask_fm = FP.observe_tiles_rows(cards, ints, rg)
        key = jax.random.key(9)
        acts, rews, dones = [], [], []
        for t in range(args.steps):
            key, k = jax.random.split(key)
            logits, _ = FP.policy_apply_fm(params, FP.flat_fm(obs_fm),
                                           FP.flat_fm(mask_fm) != 0)
            a, _ = FP.sample_fm(k, logits)
            cards, ints, rg, rew, done, obs_fm, mask_fm = FP.step_tiles_rows(
                cards, ints, rg, FP.unflat_fm(a[None], 1))
            acts.append(np.asarray(a))
            rews.append(np.asarray(FP.flat_fm(rew))[0])
            dones.append(np.asarray(FP.flat_fm(done))[0] != 0)

            # obs/mask of the post-step state must equal the engine's view.
            post = FF.unpack_full_state(FP.untile_packed(cards, ints, rg))
            obs_ref = np.asarray(jax.vmap(full_env.observe_vector)(post))
            mask_ref = np.asarray(jax.vmap(full_env.action_mask)(post))
            od = int((obs_ref != np.asarray(FP.flat_fm(obs_fm)).T).sum())
            md = int((mask_ref != (np.asarray(FP.flat_fm(mask_fm)).T != 0)).sum())
            if od or md:
                print(f"step {t}: obs mismatches={od} mask mismatches={md}")
                fails += 1
            print(f"[{time.time()-t0:.0f}s] step {t} collected+checked",
                  flush=True)
        final_packed = FP.untile_packed(cards, ints, rg)

        # Replay recorded actions through the whole-rollout mirror.
        out = FF.rollout_full_rows(st0, jnp.asarray(np.stack(acts)), args.steps)

    tot_ref = np.asarray(out["total_reward"])
    epi_ref = np.asarray(out["episodes"])
    if np.abs(tot_ref - np.stack(rews).sum(0)).max() > 0:
        print("total reward mismatch:",
              float(np.abs(tot_ref - np.stack(rews).sum(0)).max()))
        fails += 1
    if not (epi_ref == np.stack(dones).sum(0)).all():
        print("episode count mismatch")
        fails += 1
    rp = FF.pack_full_state(out["state"])
    for kname in ("cards", "ints", "rng"):
        neq = int((np.asarray(rp[kname]) != np.asarray(final_packed[kname])).sum())
        if neq:
            print(f"final {kname}: {neq} mismatches")
            fails += 1

    print("OK" if fails == 0 else f"FAILED ({fails} groups)", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
