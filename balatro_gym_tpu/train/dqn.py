"""On-device DQN learner (reference: train_balatro_agent.py --algorithm dqn,
hyperparams table :346-360 — lr 1e-4, buffer 100k, batch 32, target update,
eps-greedy exploration).

Everything lives on device: the replay buffer is a ring of arrays inside the
train state, acting/storing/sampling/TD-updates compile into one XLA program
per update. Invalid actions are masked out of both the behaviour policy and
the bootstrap max.
"""
from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from balatro_gym_tpu.train.ppo import EnvHooks


class QNetwork(nn.Module):
    n_actions: int
    hidden: tuple = (256, 256)

    @nn.compact
    def __call__(self, obs, mask):
        x = obs
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        q = nn.Dense(self.n_actions)(x)
        return jnp.where(mask, q, -1e9)


@struct.dataclass
class DQNConfig:
    n_envs: int = 256
    buffer_size: int = 100_000        # transitions (ring, device-resident)
    batch_size: int = 512
    lr: float = 1e-4
    gamma: float = 0.99
    eps_start: float = 1.0
    eps_end: float = 0.05
    eps_decay_updates: int = 500
    target_update_every: int = 100    # updates between target syncs
    steps_per_update: int = 4         # env steps collected per update
    learning_starts: int = 1_000     # min transitions before TD updates
    hidden: tuple = (256, 256)


@struct.dataclass
class DQNState:
    params: Any
    target_params: Any
    opt_state: Any
    env_states: Any
    key: jnp.ndarray
    update_idx: jnp.ndarray
    # Ring replay buffer.
    buf_obs: jnp.ndarray      # [cap, D] f32
    buf_action: jnp.ndarray   # [cap] i32
    buf_reward: jnp.ndarray   # [cap] f32
    buf_next_obs: jnp.ndarray  # [cap, D] f32
    buf_next_mask: jnp.ndarray  # [cap, A] bool
    buf_done: jnp.ndarray     # [cap] i8 (bool semantics; see ring-write note)
    buf_ptr: jnp.ndarray      # i32
    buf_len: jnp.ndarray      # i32


def make_dqn(hooks: EnvHooks, cfg: DQNConfig):
    net = QNetwork(n_actions=hooks.n_actions, hidden=tuple(cfg.hidden))
    tx = optax.adam(cfg.lr)
    cap = cfg.buffer_size

    def init_fn(key):
        k_net, k_env, k_run = jax.random.split(key, 3)
        params = net.init(k_net, jnp.zeros((1, hooks.obs_dim), jnp.float32),
                          jnp.ones((1, hooks.n_actions), bool))
        env_states = jax.vmap(hooks.reset)(jax.random.split(k_env, cfg.n_envs))
        return DQNState(
            params=params, target_params=params, opt_state=tx.init(params),
            env_states=env_states, key=k_run, update_idx=jnp.int32(0),
            buf_obs=jnp.zeros((cap, hooks.obs_dim), jnp.float32),
            buf_action=jnp.zeros(cap, jnp.int32),
            buf_reward=jnp.zeros(cap, jnp.float32),
            buf_next_obs=jnp.zeros((cap, hooks.obs_dim), jnp.float32),
            buf_next_mask=jnp.ones((cap, hooks.n_actions), bool),
            # i8, not bool: XLA:TPU silently drops dynamic-index BOOL
            # scatter updates in vmapped programs (ring-writes below).
            buf_done=jnp.zeros(cap, jnp.int8),
            buf_ptr=jnp.int32(0), buf_len=jnp.int32(0),
        )

    def _epsilon(update_idx):
        frac = jnp.clip(update_idx.astype(jnp.float32) / cfg.eps_decay_updates,
                        0.0, 1.0)
        return cfg.eps_start + frac * (cfg.eps_end - cfg.eps_start)

    def update_fn(ts: DQNState):
        key, k_steps, k_sample = jax.random.split(ts.key, 3)
        eps = _epsilon(ts.update_idx)

        # ---- collect steps_per_update env steps with eps-greedy ----
        def collect(carry, k):
            env_states, buf = carry
            obs = jax.vmap(hooks.observe)(env_states)
            mask = jax.vmap(hooks.action_mask)(env_states)
            q = net.apply(ts.params, obs, mask)
            k_eps, k_rand = jax.random.split(k)
            greedy = jnp.argmax(q, -1)
            rand = jax.random.categorical(
                k_rand, jnp.where(mask, 0.0, -jnp.inf))
            explore = jax.random.uniform(k_eps, (obs.shape[0],)) < eps
            action = jnp.where(explore, rand, greedy).astype(jnp.int32)
            env_states, reward, done = jax.vmap(hooks.step_autoreset)(
                env_states, action)
            next_obs = jax.vmap(hooks.observe)(env_states)
            next_mask = jax.vmap(hooks.action_mask)(env_states)

            # Ring-write the batch.
            (b_obs, b_a, b_r, b_no, b_nm, b_d, ptr, blen) = buf
            idx = (ptr + jnp.arange(cfg.n_envs)) % cap
            buf = (b_obs.at[idx].set(obs), b_a.at[idx].set(action),
                   b_r.at[idx].set(reward.astype(jnp.float32)),
                   b_no.at[idx].set(next_obs), b_nm.at[idx].set(next_mask),
                   b_d.at[idx].set(done.astype(jnp.int8)),
                   (ptr + cfg.n_envs) % cap,
                   jnp.minimum(blen + cfg.n_envs, cap))
            return (env_states, buf), (reward.astype(jnp.float32), done)

        buf0 = (ts.buf_obs, ts.buf_action, ts.buf_reward, ts.buf_next_obs,
                ts.buf_next_mask, ts.buf_done, ts.buf_ptr, ts.buf_len)
        (env_states, buf), (rewards, dones) = jax.lax.scan(
            collect, (ts.env_states, buf0),
            jax.random.split(k_steps, cfg.steps_per_update))
        (b_obs, b_a, b_r, b_no, b_nm, b_d, ptr, blen) = buf

        # ---- TD update on a uniform sample ----
        sample = jax.random.randint(k_sample, (cfg.batch_size,), 0,
                                    jnp.maximum(blen, 1))
        s_obs = b_obs[sample]
        s_a = b_a[sample]
        s_r = b_r[sample]
        s_no = b_no[sample]
        s_nm = b_nm[sample]
        s_d = b_d[sample].astype(bool)

        q_next = net.apply(ts.target_params, s_no, s_nm)
        target = s_r + cfg.gamma * jnp.max(q_next, -1) * (1.0 - s_d.astype(jnp.float32))

        def loss_fn(params):
            q = net.apply(params, s_obs, jnp.ones_like(s_nm))
            q_a = jnp.take_along_axis(q, s_a[:, None], -1)[:, 0]
            return optax.huber_loss(q_a, jax.lax.stop_gradient(target)).mean()

        loss, grads = jax.value_and_grad(loss_fn)(ts.params)
        ready = blen >= cfg.learning_starts
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        params = jax.tree.map(lambda new, old: jnp.where(ready, new, old),
                              params, ts.params)
        opt_state = jax.tree.map(lambda new, old: jnp.where(ready, new, old),
                                 opt_state, ts.opt_state)

        sync = (ts.update_idx + 1) % cfg.target_update_every == 0
        target_params = jax.tree.map(
            lambda t, p: jnp.where(sync, p, t), ts.target_params, params)

        out = ts.replace(
            params=params, target_params=target_params, opt_state=opt_state,
            env_states=env_states, key=key, update_idx=ts.update_idx + 1,
            buf_obs=b_obs, buf_action=b_a, buf_reward=b_r, buf_next_obs=b_no,
            buf_next_mask=b_nm, buf_done=b_d, buf_ptr=ptr, buf_len=blen)
        return out, {"loss": loss, "epsilon": eps,
                     "buffer": blen.astype(jnp.float32),
                     "mean_reward": rewards.mean(),
                     "episodes": dones.sum()}

    return init_fn, update_fn


def train(num_updates: int = 32, cfg: DQNConfig | None = None, seed: int = 0,
          hooks: EnvHooks | None = None):
    from balatro_gym_tpu.train.ppo import sim_env_hooks

    cfg = cfg or DQNConfig()
    hooks = hooks or sim_env_hooks()
    init_fn, update_fn = make_dqn(hooks, cfg)
    ts = init_fn(jax.random.key(seed))
    step = jax.jit(update_fn)
    metrics = None
    for _ in range(num_updates):
        ts, metrics = step(ts)
    return ts, metrics
