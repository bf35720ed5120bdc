"""ops/kernel_rng must be BIT-IDENTICAL to jax.random (threefry).

This is the foundation for fusing the full-game env into a Pallas kernel
without giving up the engines' named-stream determinism contract
(core/rng.py derives every draw via fold_in chains + uniform/randint —
all replicated here). Checks run both as plain XLA over vmapped keys and
inside a Pallas kernel in interpret mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balatro_gym_tpu.ops import kernel_rng as KR

N = 512


def _key_data(k):
    return np.asarray(jax.random.key_data(k)).astype(np.uint32)


@pytest.fixture(scope="module")
def keys():
    """N distinct keys via fold_in chains (as the engines derive them)."""
    base = jax.random.key(1234)
    ks = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(N))
    kd = jax.vmap(jax.random.key_data)(ks)
    return ks, jnp.asarray(kd[:, 0], jnp.uint32), jnp.asarray(kd[:, 1], jnp.uint32)


def test_seed_and_fold_in(keys):
    ks, k1, k2 = keys
    # seed_key matches jax.random.key for 32-bit seeds.
    for s in (0, 1, 1234, 2**31 - 1):
        h, l = KR.seed_key(jnp.int32(s))
        np.testing.assert_array_equal(
            np.stack([np.asarray(h), np.asarray(l)]), _key_data(jax.random.key(s)))
    # fold_in matches elementwise across all N keys.
    data = jnp.arange(N, dtype=jnp.uint32) * 7 + 3
    ref = jax.vmap(jax.random.fold_in)(ks, data)
    rd = np.asarray(jax.vmap(jax.random.key_data)(ref))
    f1, f2 = KR.fold_in(k1, k2, data)
    np.testing.assert_array_equal(np.asarray(f1), rd[:, 0])
    np.testing.assert_array_equal(np.asarray(f2), rd[:, 1])


def test_split2(keys):
    ks, k1, k2 = keys
    ref = jax.vmap(lambda k: jax.random.split(k))(ks)        # [N, 2] keys
    rd = np.asarray(jax.vmap(jax.vmap(jax.random.key_data))(ref))  # [N,2,2]
    (a1, a2), (b1, b2) = KR.split2(k1, k2)
    np.testing.assert_array_equal(np.asarray(a1), rd[:, 0, 0])
    np.testing.assert_array_equal(np.asarray(a2), rd[:, 0, 1])
    np.testing.assert_array_equal(np.asarray(b1), rd[:, 1, 0])
    np.testing.assert_array_equal(np.asarray(b2), rd[:, 1, 1])


def test_random_bits_and_uniform(keys):
    ks, k1, k2 = keys
    ref_bits = np.asarray(jax.vmap(
        lambda k: jax.random.bits(k, (3,), jnp.uint32))(ks))
    for i in range(3):
        got = np.asarray(KR.random_bits32(k1, k2, i))
        np.testing.assert_array_equal(got, ref_bits[:, i])

    ref_u = np.asarray(jax.vmap(
        lambda k: jax.random.uniform(k, dtype=jnp.float32))(ks), np.float32)
    got_u = np.asarray(KR.uniform_f32(KR.random_bits32(k1, k2)))
    np.testing.assert_array_equal(got_u, ref_u)

    ref_u3 = np.asarray(jax.vmap(
        lambda k: jax.random.uniform(k, (3,), jnp.float32, 2.0, 5.0))(ks))
    for i in range(3):
        got = np.asarray(KR.uniform_f32(KR.random_bits32(k1, k2, i), 2.0, 5.0))
        np.testing.assert_array_equal(got, ref_u3[:, i])


def test_randint(keys):
    ks, k1, k2 = keys
    for lo, hi in ((0, 24), (1, 23), (2, 15), (0, 4), (5, 6)):
        ref = np.asarray(jax.vmap(
            lambda k: jax.random.randint(k, (), lo, hi, jnp.int32))(ks))
        got = np.asarray(KR.randint(k1, k2, lo, hi))
        np.testing.assert_array_equal(got, ref, err_msg=f"randint({lo},{hi})")


def test_split_child(keys):
    """split_child(i) == jax.random.split(key, n)[i] for the 4-way splits
    the engines use (shop generation, consumables) and beyond (n=7)."""
    ks, k1, k2 = keys
    for n in (2, 4, 7):
        ref = jax.vmap(lambda k: jax.random.split(k, n))(ks)   # [N, n] keys
        rd = np.asarray(jax.vmap(jax.vmap(jax.random.key_data))(ref))
        for i in range(n):
            g1, g2 = KR.split_child(k1, k2, jnp.uint32(i))
            np.testing.assert_array_equal(np.asarray(g1), rd[:, i, 0],
                                          err_msg=f"split({n})[{i}] hi")
            np.testing.assert_array_equal(np.asarray(g2), rd[:, i, 1],
                                          err_msg=f"split({n})[{i}] lo")


def test_randint_indexed_and_array_bounds(keys):
    """The fused kernel's shaped draws: KR.randint(..., i=k) must equal
    jax.random.randint(key, (n,), lo, hi)[k], including ARRAY bounds
    (data-dependent spans, e.g. The Fool's cons_n-bounded pick)."""
    ks, k1, k2 = keys
    lo, hi = 1, 23
    ref = np.asarray(jax.vmap(
        lambda k: jax.random.randint(k, (5,), lo, hi, jnp.int32))(ks))
    for i in range(5):
        got = np.asarray(KR.randint(k1, k2, lo, hi, i))
        np.testing.assert_array_equal(got, ref[:, i],
                                      err_msg=f"randint[(5,)][{i}]")

    # Array bounds: per-key maxval (jax broadcasts bounds over the shape).
    maxv = (jnp.arange(N, dtype=jnp.int32) % 7) + 2
    ref = np.asarray(jax.vmap(
        lambda k, m: jax.random.randint(k, (), 0, m, jnp.int32))(ks, maxv))
    got = np.asarray(KR.randint(k1, k2, jnp.int32(0), maxv))
    np.testing.assert_array_equal(got, ref, err_msg="randint array maxval")
    # Degenerate span (maxval == minval + 1) stays in range everywhere.
    one = np.asarray(KR.randint(k1, k2, jnp.int32(3), jnp.int32(4)))
    assert (one == 3).all()


def test_inside_pallas_kernel(keys):
    """The same primitives, executed inside a Pallas kernel (interpret)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ks, k1, k2 = keys
    SUB, LANES = 8, 64  # 512 keys as a (8, 64) tile

    def kernel(k1_ref, k2_ref, bits_ref, uni_ref, ri_ref, fold_ref):
        a, b = k1_ref[:], k2_ref[:]
        f1, f2 = KR.fold_in(a, b, jnp.full((SUB, LANES), 42, jnp.uint32))
        fold_ref[0] = f1
        fold_ref[1] = f2
        bits_ref[:] = KR.random_bits32(f1, f2)
        uni_ref[:] = KR.uniform_f32(KR.random_bits32(f1, f2, 1))
        ri_ref[:] = KR.randint(f1, f2, 0, 24)

    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((SUB, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((SUB, LANES), jnp.float32),
            jax.ShapeDtypeStruct((SUB, LANES), jnp.int32),
            jax.ShapeDtypeStruct((2, SUB, LANES), jnp.uint32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4),
        interpret=True,
    )(k1.reshape(SUB, LANES), k2.reshape(SUB, LANES))
    bits, uni, ri, fold = (np.asarray(x).reshape(-1, *x.shape[2:]) if x.ndim > 2
                           else np.asarray(x).reshape(-1) for x in out)

    folded = jax.vmap(lambda k: jax.random.fold_in(k, jnp.uint32(42)))(ks)
    ref_bits = np.asarray(jax.vmap(
        lambda k: jax.random.bits(k, (2,), jnp.uint32))(folded))
    ref_uni = np.asarray(jax.vmap(
        lambda k: jax.random.uniform(k, (2,), jnp.float32))(folded))[:, 1]
    ref_ri = np.asarray(jax.vmap(
        lambda k: jax.random.randint(k, (), 0, 24, jnp.int32))(folded))
    fold_ref = np.asarray(jax.vmap(jax.random.key_data)(folded))

    np.testing.assert_array_equal(np.asarray(out[3]).reshape(2, -1).T, fold_ref)
    np.testing.assert_array_equal(bits, ref_bits[:, 0])
    np.testing.assert_array_equal(uni.astype(np.float32), ref_uni)
    np.testing.assert_array_equal(ri, ref_ri)


def test_rank_permutation():
    """Validity (bijective), determinism, and rough uniformity."""
    base = jax.random.key(9)
    ks = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(N))
    kd = jax.vmap(jax.random.key_data)(ks)
    k1 = jnp.asarray(kd[:, 0], jnp.uint32)
    k2 = jnp.asarray(kd[:, 1], jnp.uint32)

    perm52 = np.stack([np.asarray(p) for p in KR.rank_permutation(k1, k2, 52)])
    # Bijective: every key's 52 ranks are a permutation of 0..51.
    assert (np.sort(perm52, axis=0) == np.arange(52)[:, None]).all()
    # Deterministic: recompute equals.
    again = np.stack([np.asarray(p) for p in KR.rank_permutation(k1, k2, 52)])
    np.testing.assert_array_equal(perm52, again)

    # Uniformity (n=8 over N keys): each (element, position) cell should be
    # ~N/8; allow 5 sigma.
    perm8 = np.stack([np.asarray(p) for p in KR.rank_permutation(k1, k2, 8)])
    counts = np.stack([np.bincount(perm8[i], minlength=8) for i in range(8)])
    expected = N / 8
    sigma = (N * (1 / 8) * (7 / 8)) ** 0.5
    assert np.all(np.abs(counts - expected) < 5 * sigma), counts
