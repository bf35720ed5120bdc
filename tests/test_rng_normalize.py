"""Named-stream RNG and running-normalization units."""
import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.core import rng as R
from balatro_gym_tpu.train.normalize import (
    init_stats, normalize, normalize_reward, update_stats)


def test_streams_independent_and_deterministic():
    master = jax.random.key(7)
    counters = R.init_counters()
    k1, c1 = R.next_key(master, counters, "deck_shuffle")
    k2, c2 = R.next_key(master, counters, "shop_generation")
    # Different streams, same counters -> different keys.
    assert not np.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))
    # Same stream, same counter -> identical.
    k1b, _ = R.next_key(master, counters, "deck_shuffle")
    assert np.array_equal(jax.random.key_data(k1), jax.random.key_data(k1b))
    # Counter advanced only for the drawn stream.
    assert int(c1[R.STREAM_ID["deck_shuffle"]]) == 1
    assert int(c1[R.STREAM_ID["shop_generation"]]) == 0
    # Next draw from the same stream differs.
    k1c, _ = R.next_key(master, c1, "deck_shuffle")
    assert not np.array_equal(jax.random.key_data(k1), jax.random.key_data(k1c))


def test_sixteen_streams_exist():
    assert R.NUM_STREAMS == 16
    assert "card_enhancement" in R.STREAM_ID


def test_running_stats_match_numpy():
    rng = np.random.default_rng(0)
    data = rng.normal(3.0, 2.0, size=(1000, 4)).astype(np.float32)
    rs = init_stats(4)
    for chunk in np.split(data, 10):
        rs = update_stats(rs, jnp.asarray(chunk))
    np.testing.assert_allclose(np.asarray(rs.mean), data.mean(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rs.var), data.var(0), rtol=1e-3)
    z = np.asarray(normalize(rs, jnp.asarray(data)))
    assert abs(z.mean()) < 0.05 and abs(z.std() - 1.0) < 0.05


def test_reward_normalization_scales_only():
    rs = init_stats()
    rs = update_stats(rs, jnp.asarray(np.full(100, 10.0, np.float32)) +
                      jnp.asarray(np.random.default_rng(1).normal(0, 2, 100).astype(np.float32)))
    r = normalize_reward(rs, jnp.asarray(5.0))
    # Scaled by std, not centered: sign preserved, magnitude shrunk.
    assert 0 < float(r) < 5.0
