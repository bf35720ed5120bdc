"""Threefry-2x32 PRNG as pure elementwise ops — jax.random, in-kernel.

Why this exists: the fused Pallas rollout kernels keep env state in VMEM
across steps, but this repo's engines derive randomness from *named
jax.random streams* (core/rng.py), and same-seed bit-determinism is part of
the observable contract. ``pltpu.prng_random_bits`` is a different
generator, so a fused kernel using it can only be distribution-equivalent.
This module reimplements the exact Threefry-2x32 primitives jax.random uses
— as plain ``jnp`` elementwise integer ops on (hi, lo) uint32 word pairs —
so the SAME code runs inside a Pallas kernel (vectors of per-env keys) and
in ordinary XLA, producing BIT-IDENTICAL draws to ``jax.random``.

Replicated semantics (cited into jax/_src/prng.py and jax/_src/random.py of
the pinned jax 0.9.0, with ``jax_threefry_partitionable=True`` — the
default here):

* ``threefry2x32``     — the 20-round hash, unrolled (prng.py:862-958).
* ``seed_key``         — key from integer seed (prng.py:802-829).
* ``fold_in``          — threefry_2x32(key, threefry_seed(data))
                         (prng.py:1163-1170).
* ``split2``           — partitionable split: counts = 64-bit iota hi/lo
                         (prng.py:1150-1160).
* ``random_bits32``    — partitionable 32-bit draw i: bits1^bits2 of the
                         64-bit iota pair (prng.py:1183-1200).
* ``uniform_f32``      — mantissa-fill trick: bitcast((bits>>9)|0x3f800000)
                         - 1, scaled (random.py:435-478).
* ``randint``          — double-width modulus with the 2**16 multiplier
                         identity (random.py:581-657).

All functions are shape-polymorphic and elementwise over key components
(k1, k2 = hi, lo uint32 arrays of any equal shape), so a fused kernel holds
per-env key vectors as (SUB, LANES) uint32 arrays and calls these directly.

Tests: tests/test_kernel_rng.py asserts bit-equality against jax.random for
chains of fold_in/split/bits/uniform/randint, both as plain XLA and inside
a Pallas kernel (interpret mode); scripts/validate_fused_tpu.py covers the
real-TPU lowering.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_ROT1 = (13, 15, 26, 6)
_ROT2 = (17, 29, 16, 24)
_PARITY = 0x1BD11BDA  # python int: a jnp scalar here would be a captured
#                       constant, which pallas kernels reject.


def _rotl(x, r):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def threefry2x32(k1, k2, x1, x2):
    """The Threefry-2x32 hash, 20 rounds unrolled (prng.py:862-958).

    All args uint32 arrays of one broadcast shape; returns (y1, y2).
    """
    k1 = jnp.asarray(k1, jnp.uint32)
    k2 = jnp.asarray(k2, jnp.uint32)
    ks = (k1, k2, k1 ^ k2 ^ jnp.uint32(_PARITY))
    x0 = jnp.asarray(x1, jnp.uint32) + ks[0]
    x1 = jnp.asarray(x2, jnp.uint32) + ks[1]

    def four(x0, x1, rots):
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x0 ^ x1
        return x0, x1

    x0, x1 = four(x0, x1, _ROT1)
    x0, x1 = x0 + ks[1], x1 + ks[2] + jnp.uint32(1)
    x0, x1 = four(x0, x1, _ROT2)
    x0, x1 = x0 + ks[2], x1 + ks[0] + jnp.uint32(2)
    x0, x1 = four(x0, x1, _ROT1)
    x0, x1 = x0 + ks[0], x1 + ks[1] + jnp.uint32(3)
    x0, x1 = four(x0, x1, _ROT2)
    x0, x1 = x0 + ks[1], x1 + ks[2] + jnp.uint32(4)
    x0, x1 = four(x0, x1, _ROT1)
    x0, x1 = x0 + ks[2], x1 + ks[0] + jnp.uint32(5)
    return x0, x1


def seed_key(seed):
    """(k1, k2) from an integer seed (prng.py:802-829): hi word 0 for 32-bit
    seeds, lo word = seed as uint32."""
    seed = jnp.asarray(seed)
    hi = jnp.zeros(seed.shape, jnp.uint32)
    lo = jnp.asarray(seed, jnp.int64 if seed.dtype.itemsize == 8 else jnp.int32)
    if seed.dtype.itemsize == 8:  # pragma: no cover - engines use 32-bit seeds
        hi = (lo >> 32).astype(jnp.uint32)
    return hi, lo.astype(jnp.uint32)


def fold_in(k1, k2, data):
    """New key = threefry_2x32(key, threefry_seed(data)) (prng.py:1163-1170).
    data: uint32/int32 array broadcastable to the key shape."""
    d = jnp.asarray(data).astype(jnp.uint32)
    return threefry2x32(k1, k2, jnp.zeros_like(d), d)


def split2(k1, k2):
    """jax.random.split(key) -> ((a1, a2), (b1, b2)) — partitionable split
    (prng.py:1156-1160): child i = threefry(key, iota64 hi/lo of index i)."""
    zero = jnp.zeros_like(k1)
    a1, a2 = threefry2x32(k1, k2, zero, zero)
    b1, b2 = threefry2x32(k1, k2, zero, jnp.ones_like(k2))
    return (a1, a2), (b1, b2)


def split_child(k1, k2, i):
    """Child ``i`` of ``jax.random.split(key, n)`` for any n < 2**32
    (prng.py:1150-1160): child i = threefry(key, iota64 hi/lo of index i).
    ``split2`` is the n=2 special case; this generalizes to the 4-way splits
    the engines use (shop generation, consumables)."""
    # NB: jnp.full with a traced fill value lowers through a device_put
    # primitive, which Mosaic rejects inside a Pallas kernel — broadcast
    # explicitly instead.
    lo = jnp.broadcast_to(jnp.asarray(i, jnp.uint32), jnp.shape(k1))
    return threefry2x32(k1, k2, jnp.zeros_like(k1), lo)


def random_bits32(k1, k2, i=0):
    """i-th 32-bit draw of jax.random.bits(key, shape) in row-major order
    (prng.py:1183-1200): bits = y1 ^ y2 of the 64-bit iota pair (hi=0, lo=i)
    for arrays smaller than 2**32 elements."""
    lo = jnp.full(jnp.shape(k1), i, jnp.uint32) if jnp.ndim(jnp.asarray(i)) == 0 \
        else jnp.asarray(i, jnp.uint32)
    y1, y2 = threefry2x32(k1, k2, jnp.zeros_like(k1), lo)
    return y1 ^ y2


def uniform_f32(bits, minval=0.0, maxval=1.0):
    """jax.random.uniform from 32 random bits (random.py:456-478)."""
    fb = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    f = lax.bitcast_convert_type(fb, jnp.float32) - jnp.float32(1.0)
    out = f * (jnp.float32(maxval) - jnp.float32(minval)) + jnp.float32(minval)
    return jnp.maximum(jnp.float32(minval), out)


def randint(k1, k2, minval, maxval, i=0):
    """jax.random.randint(key, shape, minval, maxval, int32), elementwise
    over the key arrays (random.py:581-657, in-range case).

    ``i`` selects the i-th element of a shaped draw — e.g.
    ``jax.random.randint(key, (n,), lo, hi)[i]`` equals
    ``randint(k1, k2, lo, hi, i)``. ``minval``/``maxval`` may be arrays
    (broadcast against the key shape) for data-dependent bounds."""
    (a1, a2), (b1, b2) = split2(k1, k2)
    higher = random_bits32(a1, a2, i)
    lower = random_bits32(b1, b2, i)
    # span guard runs in i32 (Mosaic has no unsigned max lowering); all call
    # sites have 0 <= maxval - minval < 2**31, where signed == unsigned.
    # Broadcast to the key shape before the bitcast: tpu.bitcast only
    # accepts vectors, and scalar bounds are common.
    span_i = jnp.broadcast_to(
        jnp.maximum(jnp.asarray(maxval - minval, jnp.int32), 1),
        jnp.shape(k1))
    span = lax.bitcast_convert_type(span_i, jnp.uint32)
    mult = jnp.uint32(2 ** 16) % span
    mult = (mult * mult) % span
    off = ((higher % span) * mult + lower % span) % span
    return jnp.asarray(minval, jnp.int32) + lax.convert_element_type(off, jnp.int32)


def rank_permutation(k1, k2, n: int):
    """Uniform random permutation of 0..n-1 per key, kernel-friendly.

    Draws n iid 32-bit words (the exact draws of ``jax.random.bits(key,
    (n,))``) and ranks them with an index tie-break: ``perm[i]`` is the
    position assigned to element i. Fully parallel (n^2 elementwise
    compares), no sort/scatter — usable inside a Pallas kernel where
    ``jax.random.permutation``'s sort-based shuffle cannot go. Uniform up to
    tie probability ~n^2 / 2^33 (~3e-7 for n=52); ties resolve
    deterministically, so same key => same permutation everywhere.

    This is the fused full-env kernel's deck-shuffle primitive
    (docs/FUSED_FULL_ENV_DESIGN.md): NOT bit-identical to the jnp engine's
    ``jax.random.permutation`` (PARITY-style deviation for the fused path).

    Returns a list of n int32 arrays shaped like k1.
    """
    u = [random_bits32(k1, k2, i) for i in range(n)]
    perm = []
    for i in range(n):
        rank = jnp.zeros(jnp.shape(k1), jnp.int32)
        for j in range(n):
            if j == i:
                continue
            less = (u[j] < u[i]) | ((u[j] == u[i]) & (j < i))
            rank = rank + less.astype(jnp.int32)
        perm.append(rank)
    return perm
