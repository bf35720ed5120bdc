"""Orbax checkpoint round-trip and DP scaling efficiency on the virtual mesh."""
import jax
import numpy as np
import pytest

from balatro_gym_tpu.train.ppo import PPOConfig, make_ppo, sim_env_hooks

TINY = PPOConfig(n_envs=16, rollout_len=4, epochs=1, minibatches=2, hidden=(16,))


def test_checkpoint_roundtrip(tmp_path):
    from balatro_gym_tpu.utils.checkpoint import (
        restore_train_state, save_train_state)

    init_fn, update_fn, _ = make_ppo(sim_env_hooks(), TINY)
    step = jax.jit(update_fn)
    ts = init_fn(jax.random.key(0))
    ts, _ = step(ts)
    save_train_state(tmp_path / "ckpt", ts)
    restored = restore_train_state(tmp_path / "ckpt", ts)
    # Exact resume: one more update from both must be bit-identical.
    a, ma = step(ts)
    b, mb = step(restored)
    assert float(ma["loss"]) == float(mb["loss"])
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs virtual mesh")
def test_scaling_efficiency_virtual_mesh():
    from balatro_gym_tpu.parallel.scaling_bench import measure

    t1 = measure(1, envs_per_dev=16, rollout=4, updates=2)
    t8 = measure(8, envs_per_dev=16, rollout=4, updates=2)
    # Virtual CPU devices share 2 host cores, so wall-clock efficiency is
    # meaningless here; assert the harness runs and reports sane numbers.
    assert t1 > 0 and t8 > 0
