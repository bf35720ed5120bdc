"""On-device A2C learner (reference: train_balatro_agent.py --algorithm a2c,
hyperparams table :362-377 — lr 7e-4, n_steps 5, gamma 0.99, vf 0.5,
ent 0.01).

Synchronous advantage actor-critic: one short rollout per update, a single
full-batch gradient step on -logπ·A + value MSE − entropy. Shares the env
hooks, network, and normalization machinery with the PPO learner.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from balatro_gym_tpu.train.networks import ActorCritic
from balatro_gym_tpu.train.normalize import init_stats, normalize, update_stats
from balatro_gym_tpu.train.ppo import EnvHooks


@struct.dataclass
class A2CConfig:
    n_envs: int = 1024
    rollout_len: int = 5
    lr: float = 7e-4
    gamma: float = 0.99
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    max_grad_norm: float = 0.5
    hidden: tuple = (256, 256)
    normalize_obs: bool = True


@struct.dataclass
class A2CState:
    params: Any
    opt_state: Any
    env_states: Any
    key: jnp.ndarray
    obs_stats: Any
    update_idx: jnp.ndarray


def make_a2c(hooks: EnvHooks, cfg: A2CConfig):
    net = ActorCritic(n_actions=hooks.n_actions, hidden=tuple(cfg.hidden))
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.rmsprop(cfg.lr, decay=0.99, eps=1e-5))

    def init_fn(key):
        k_net, k_env, k_run = jax.random.split(key, 3)
        params = net.init(k_net, jnp.zeros((1, hooks.obs_dim), jnp.float32),
                          jnp.ones((1, hooks.n_actions), bool))
        env_states = jax.vmap(hooks.reset)(jax.random.split(k_env, cfg.n_envs))
        return A2CState(params=params, opt_state=tx.init(params),
                        env_states=env_states, key=k_run,
                        obs_stats=init_stats(hooks.obs_dim),
                        update_idx=jnp.int32(0))

    def _obs_mask(env_states, obs_stats):
        obs = jax.vmap(hooks.observe)(env_states)
        if cfg.normalize_obs:
            obs = normalize(obs_stats, obs)
        return obs, jax.vmap(hooks.action_mask)(env_states)

    def update_fn(ts: A2CState, axis_name: str | None = None):
        key, k_roll = jax.random.split(ts.key)
        if axis_name is not None:
            k_roll = jax.random.fold_in(k_roll, jax.lax.axis_index(axis_name))

        def body(env_states, k):
            obs, mask = _obs_mask(env_states, ts.obs_stats)
            logits, value = net.apply(ts.params, obs, mask)
            action = jax.random.categorical(k, logits)
            env_states, reward, done = jax.vmap(hooks.step_autoreset)(
                env_states, action)
            return env_states, (obs, mask, action, value,
                                reward.astype(jnp.float32), done)

        env_states, (obs, mask, action, value, reward, done) = jax.lax.scan(
            body, ts.env_states, jax.random.split(k_roll, cfg.rollout_len))

        last_obs, last_mask = _obs_mask(env_states, ts.obs_stats)
        _, last_v = net.apply(ts.params, last_obs, last_mask)

        def disc(carry, x):
            r, d, v = x
            ret = r + cfg.gamma * carry * (1.0 - d.astype(jnp.float32))
            return ret, ret

        _, returns = jax.lax.scan(disc, last_v, (reward, done, value),
                                  reverse=True)
        adv = returns - value

        def loss_fn(params):
            B = cfg.rollout_len * obs.shape[1]
            o = obs.reshape(B, -1)
            m = mask.reshape(B, -1)
            a = action.reshape(B)
            logits, v = net.apply(params, o, m)
            logp = jax.nn.log_softmax(logits)
            pg = -(jnp.take_along_axis(logp, a[:, None], -1)[:, 0]
                   * jax.lax.stop_gradient(adv.reshape(B))).mean()
            vf = 0.5 * ((v - returns.reshape(B)) ** 2).mean()
            p = jnp.exp(logp)
            ent = -jnp.sum(jnp.where(m, p * logp, 0.0), -1).mean()
            return pg + cfg.vf_coef * vf - cfg.ent_coef * ent, (pg, vf, ent)

        (loss, (pg, vf, ent)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)

        obs_stats = (update_stats(ts.obs_stats, obs.reshape(-1, hooks.obs_dim),
                                  axis_name)
                     if cfg.normalize_obs else ts.obs_stats)
        out = ts.replace(params=params, opt_state=opt_state,
                         env_states=env_states, key=key, obs_stats=obs_stats,
                         update_idx=ts.update_idx + 1)
        return out, {"loss": loss, "pg_loss": pg, "vf_loss": vf,
                     "entropy": ent, "mean_reward": reward.mean(),
                     "episodes": done.sum()}

    return init_fn, update_fn


def train(num_updates: int = 16, cfg: A2CConfig | None = None, seed: int = 0,
          hooks: EnvHooks | None = None):
    from balatro_gym_tpu.train.ppo import sim_env_hooks

    cfg = cfg or A2CConfig()
    hooks = hooks or sim_env_hooks()
    init_fn, update_fn = make_a2c(hooks, cfg)
    ts = init_fn(jax.random.key(seed))
    step = jax.jit(functools.partial(update_fn, axis_name=None))
    metrics = None
    for _ in range(num_updates):
        ts, metrics = step(ts)
    return ts, metrics
