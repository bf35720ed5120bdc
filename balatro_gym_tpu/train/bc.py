"""Behavioral cloning from the expert policy.

The reference's ``BehavioralCloning.pretrain`` is a stub that never runs
(train_balatro_agent.py:220-262 trains on an empty buffer). Rebuilt for
real: expert demonstrations are generated on device by the exhaustive-search
expert (train.expert), and the actor-critic is pretrained with masked
cross-entropy on (obs, expert_action) pairs — one jitted program end to end.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from balatro_gym_tpu.engine import full_env as fe
from balatro_gym_tpu.train.expert import expert_action
from balatro_gym_tpu.train.networks import ActorCritic


@struct.dataclass
class BCState:
    params: Any
    opt_state: Any
    env_states: Any
    key: jnp.ndarray


def make_bc(n_envs: int = 256, hidden=(256, 256), lr: float = 3e-4):
    """Build (init_fn, update_fn). Each update: collect one expert step from
    every env, then one supervised gradient step on the batch."""
    from balatro_gym_tpu.core.constants import Action

    net = ActorCritic(n_actions=Action.ACTION_SPACE_SIZE, hidden=tuple(hidden))
    tx = optax.adam(lr)

    def init_fn(key):
        k_net, k_env = jax.random.split(key)
        dummy = jnp.zeros((1, fe.OBS_VEC_DIM), jnp.float32)
        dmask = jnp.ones((1, Action.ACTION_SPACE_SIZE), bool)
        params = net.init(k_net, dummy, dmask)
        env_states = jax.vmap(fe.reset)(jax.random.split(k_env, n_envs))
        return BCState(params=params, opt_state=tx.init(params),
                       env_states=env_states, key=key)

    def loss_fn(params, obs, mask, target):
        logits, _ = net.apply(params, obs, mask)
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]
        acc = jnp.mean(jnp.argmax(logits, -1) == target)
        return nll.mean(), acc

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def update_fn(bc: BCState):
        obs = jax.vmap(fe.observe_vector)(bc.env_states)
        mask = jax.vmap(fe.action_mask)(bc.env_states)
        target = jax.vmap(expert_action)(bc.env_states)
        (loss, acc), grads = grad_fn(bc.params, obs, mask, target)
        updates, opt_state = tx.update(grads, bc.opt_state, bc.params)
        params = optax.apply_updates(bc.params, updates)
        env_states, _, _ = jax.vmap(fe.step_autoreset)(bc.env_states, target)
        return BCState(params=params, opt_state=opt_state,
                       env_states=env_states, key=bc.key), \
            {"bc_loss": loss, "bc_accuracy": acc}

    return init_fn, update_fn


def pretrain(num_updates: int = 50, n_envs: int = 256, seed: int = 0,
             log_every: int = 0):
    """Run BC pretraining; returns (params, last metrics)."""
    init_fn, update_fn = make_bc(n_envs=n_envs)
    bc = init_fn(jax.random.key(seed))
    step = jax.jit(update_fn)
    metrics = None
    for i in range(num_updates):
        bc, metrics = step(bc)
        if log_every and (i + 1) % log_every == 0:
            print(f"bc update {i+1}: "
                  f"loss={float(metrics['bc_loss']):.4f} "
                  f"acc={float(metrics['bc_accuracy']):.3f}")
    return bc.params, metrics
