#!/usr/bin/env python
"""Smoke test: fused rollout (interpret mode, CPU) vs jnp sim engine."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.engine import sim_env
from balatro_gym_tpu.ops.fused_rollout import rollout_fused, TILE

B = TILE
JOKERS = (1, 31, 34, 48, 72)
N_STEPS = 7
rng = np.random.default_rng(0)


def jnp_reference(actions):
    """Replay actions through the jnp engine; return final-state arrays."""
    keys = jax.random.split(jax.random.key(0), B)
    jok = jnp.broadcast_to(jnp.asarray(JOKERS, jnp.int32), (B, 5))
    st = jax.vmap(sim_env.reset)(keys, jok)
    tot = jnp.zeros(B)

    for t in range(actions.shape[0]):
        st, rew, done = jax.vmap(sim_env.step_autoreset)(
            st, jnp.asarray(actions[t]))
        tot = tot + rew
    return st, tot


def main():
    # Per-env action scripts: random but legal (discards only while left>0).
    acts = np.zeros((N_STEPS, B), np.int32)
    discards = np.full(B, 3)
    for t in range(N_STEPS):
        a = rng.integers(0, 10, B)
        a = np.where((a >= 5) & (discards <= 0), a - 5, a)
        discards = np.where(a >= 5, discards - 1, discards)
        # NOTE: jnp engine resets discards on done; this script may discard
        # illegally after an autoreset... keep plays-only for some envs.
        acts[t] = a
    # For strictness: envs 0..B/2 play-only (always legal).
    acts[:, : B // 2] = rng.integers(0, 5, (N_STEPS, B // 2))

    out = rollout_fused(0, B, N_STEPS, JOKERS, actions=acts, interpret=True)
    st, tot = jnp_reference(acts)

    half = B // 2  # strictly-legal envs
    ok = True
    for name, kern, ref in [
        ("hand_rank", out["hand_rank"][:half], st.hand_rank[:half]),
        ("hand_suit", out["hand_suit"][:half], st.hand_suit[:half]),
        ("deck_n", out["deck_n"][:half], st.deck_n[:half]),
        ("money", out["money"][:half], st.money[:half]),
        ("hands_left", out["hands_left"][:half], st.hands_left[:half]),
        ("discards_left", out["discards_left"][:half], st.discards_left[:half]),
        ("score", out["score"][:half], st.score[:half]),
    ]:
        kern = np.asarray(kern)
        ref = np.asarray(ref)
        if not np.array_equal(kern, ref):
            bad = np.argwhere(np.asarray(kern != ref))[:5]
            print(f"MISMATCH {name}: first bad idx {bad.tolist()}")
            for b in bad[:3]:
                e = int(b[0])
                print(f"  env {e}: kernel={kern[e]}, ref={ref[e]}, "
                      f"acts={acts[:, e].tolist()}")
            ok = False
        else:
            print(f"OK {name}")
    rtol = np.max(np.abs(np.asarray(out["total_reward"][:half])
                         - np.asarray(tot[:half])))
    print(f"reward max abs diff: {rtol}")
    ok &= rtol < 1e-2
    print("PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
