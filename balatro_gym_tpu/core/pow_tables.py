"""Backend-independent integer-exponent power tables.

TPU ``lax.pow`` evaluates non-power-of-2 bases via an exp/log approximation
(~3e-6 relative error — measured: ``1.5**2`` on a v5e differs from 2.25 by
1 ulp-class error), so any runtime ``base ** exponent`` silently breaks both
the exact-x-mult contract (CLAUDE.md performance rules) and CPU<->TPU
bit-consistency: ``trunc(score * pow(...))`` flips integers between
backends, which is how the fused kernel (exact multiply chains) diverged
from the TPU-run jnp engine while matching the CPU-run one bit-for-bit.

Every integer-exponent power the engines need is therefore minted ONCE here
in numpy float64 — the correctly-rounded host pow, i.e. the CPython
semantics of the reference (shop.py:105-109, balatro_env_2.py:66-74,
boss_blinds.py:409-445) — and gathered at runtime:

* under x64 (parity tests) a gather returns the f64 value = ``lax.pow``
  on CPU = the reference's Python float — parity unchanged;
* under f32 (TPU production) it returns the f64 value rounded once to f32 —
  identical on every backend, and equal to the f32 multiply chain wherever
  the chain is exact (2^k always; 3^k to k=12; 1.5^k to k=23);
* a vector gather is also cheaper than a transcendental on the hot path.

The fused full-env kernel (ops/fused_full_rollout.py) selects from the same
f32-rounded constants, so kernel == engine on every backend.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Domains (see call sites): e2 <= ~45 (Bloodstone hearts x jokers), e3 <= 15
# (x3 jokers), 1.5-exponents <= 40 (Baron x held kings) and <= 92 (blind
# extrapolation to ante 100), 0.8-exponents <= 8 (Violet: every played
# card), 1.15-exponents <= 99 (shop cost at ante 100).
POW2_NP = np.float64(2.0) ** np.arange(64)
POW3_NP = np.float64(3.0) ** np.arange(16)
POW15_NP = np.float64(1.5) ** np.arange(96)
POW08_NP = np.float64(0.8) ** np.arange(12)
POW115_NP = np.float64(1.15) ** np.arange(100)


def _gather(table_np, e, dtype):
    """table[clip(int(e), 0, len-1)] in the requested float dtype.

    One-hot dot, not an indexed gather — data-dependent ``table[ids]``
    lowers to serialized dynamic-slices on TPU (CLAUDE.md perf rules). The
    dot touches exactly one nonzero, so no rounding is introduced."""
    idx = jnp.clip(jnp.asarray(e).astype(jnp.int32), 0, len(table_np) - 1)
    oh = (idx[..., None] == jnp.arange(len(table_np))).astype(dtype)
    return oh @ jnp.asarray(table_np, dtype)


def pow2(e, dtype=jnp.float32):
    return _gather(POW2_NP, e, dtype)


def pow3(e, dtype=jnp.float32):
    return _gather(POW3_NP, e, dtype)


def pow15(e, dtype=jnp.float32):
    return _gather(POW15_NP, e, dtype)


def pow08(e, dtype=jnp.float32):
    return _gather(POW08_NP, e, dtype)


def pow115(e, dtype=jnp.float32):
    return _gather(POW115_NP, e, dtype)


def f32_list(table_np):
    """The table rounded once to f32, as Python floats — for Pallas kernels
    that select from unrolled constants (trace-time literals)."""
    return [float(x) for x in table_np.astype(np.float32)]
