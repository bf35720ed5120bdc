"""A2C and DQN learners: updates run, params move, exploration decays."""
import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.train.a2c import A2CConfig, make_a2c
from balatro_gym_tpu.train.dqn import DQNConfig, make_dqn
from balatro_gym_tpu.train.ppo import sim_env_hooks


def test_a2c_update():
    init_fn, update_fn = make_a2c(sim_env_hooks(),
                                  A2CConfig(n_envs=16, rollout_len=4, hidden=(16,)))
    step = jax.jit(lambda ts: update_fn(ts))
    ts = init_fn(jax.random.key(0))
    p0 = jax.tree.leaves(ts.params)[0]
    ts, m = step(ts)
    assert np.isfinite(float(m["loss"]))
    assert not np.array_equal(np.asarray(p0), np.asarray(jax.tree.leaves(ts.params)[0]))


def test_dqn_update_and_buffer():
    cfg = DQNConfig(n_envs=8, buffer_size=512, batch_size=32,
                    learning_starts=16, steps_per_update=2, hidden=(16,),
                    eps_decay_updates=10, target_update_every=2)
    init_fn, update_fn = make_dqn(sim_env_hooks(), cfg)
    step = jax.jit(update_fn)
    ts = init_fn(jax.random.key(0))
    for i in range(5):
        ts, m = step(ts)
    assert int(m["buffer"]) == 5 * 2 * 8  # steps * envs accumulated
    assert float(m["epsilon"]) < 1.0       # decayed
    assert np.isfinite(float(m["loss"]))
    assert int(ts.update_idx) == 5


def test_dqn_respects_learning_starts():
    cfg = DQNConfig(n_envs=4, buffer_size=256, batch_size=16,
                    learning_starts=10_000, steps_per_update=1, hidden=(16,))
    init_fn, update_fn = make_dqn(sim_env_hooks(), cfg)
    step = jax.jit(update_fn)
    ts = init_fn(jax.random.key(0))
    p0 = jax.tree.leaves(ts.params)[0]
    ts, _ = step(ts)
    # Below learning_starts: params frozen.
    np.testing.assert_array_equal(np.asarray(p0),
                                  np.asarray(jax.tree.leaves(ts.params)[0]))
