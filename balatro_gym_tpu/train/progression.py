"""On-device ante-progression reward shaping for the flagship env.

TPU-native rebuild of the reference's ``ProgressionRewardWrapper``
(train_progressive.py:21-120) — the host Gym wrapper version lives in
``envs/wrappers.py`` for shell users; this module applies the SAME shaping
inside the jitted training step so the 8192-env vectorized PPO path can
train with it at full throughput:

* +``ante_bonus`` × (new ante − episode best) when a lane reaches a new
  ante this episode (train_progressive.py:46-48);
* +``best_bonus`` once more when the lane beats its own all-time best
  (persists across autoresets, :49-52 "personal best");
* lanes stuck on ante 1 for ``stuck_limit`` steps are terminated with −50
  (:57-66 forced termination of conservative play).

Shaping is TRAINING-ONLY: evaluation uses the unwrapped hooks/env, so
reported peak antes are comparable with the plain-PPO runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from balatro_gym_tpu.train.ppo import EnvHooks


@struct.dataclass
class ProgState:
    env: object          # wrapped FullEnvState
    episode_best: jnp.ndarray   # i32, resets with the episode
    alltime_best: jnp.ndarray   # i32, persists across autoresets
    ante1_steps: jnp.ndarray    # i32 consecutive steps on ante 1


def progression_hooks(base: EnvHooks, ante_bonus: float = 200.0,
                      best_bonus: float = 100.0,
                      stuck_limit: int = 150) -> EnvHooks:
    """Wrap full-env hooks with progression shaping (state carries the
    per-lane best/stuck counters through the rollout scan)."""
    from balatro_gym_tpu.engine import full_env as fe

    def reset(key):
        return ProgState(env=base.reset(key), episode_best=jnp.int32(1),
                         alltime_best=jnp.int32(1), ante1_steps=jnp.int32(0))

    def step_autoreset(ps: ProgState, action):
        st2, reward, done = fe.step(ps.env, action)
        reward = reward.astype(jnp.float32)

        ante = st2.ante
        adv = jnp.maximum(0, ante - ps.episode_best)
        reward = reward + ante_bonus * adv.astype(jnp.float32)
        new_alltime = jnp.maximum(ps.alltime_best, ante)
        reward = reward + jnp.where(new_alltime > ps.alltime_best,
                                    best_bonus, 0.0)
        episode_best = jnp.maximum(ps.episode_best, ante)

        ante1 = jnp.where(ante == 1, ps.ante1_steps + 1, 0)
        stuck = ante1 >= stuck_limit
        reward = reward - jnp.where(stuck, 50.0, 0.0)
        done = done | stuck

        fresh = fe.reset(jax.random.fold_in(st2.key, st2.step_count))
        env3 = jax.tree.map(lambda a, b: jnp.where(done, a, b), fresh, st2)
        return ProgState(
            env=env3,
            episode_best=jnp.where(done, 1, episode_best),
            alltime_best=new_alltime,  # personal best survives the reset
            ante1_steps=jnp.where(done, 0, ante1),
        ), reward, done

    return EnvHooks(
        reset=reset,
        step_autoreset=step_autoreset,
        step=None,  # training-only wrapper; evaluate on the base hooks
        observe=lambda ps: base.observe(ps.env),
        action_mask=lambda ps: base.action_mask(ps.env),
        n_actions=base.n_actions,
        obs_dim=base.obs_dim,
    )
