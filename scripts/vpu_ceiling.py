#!/usr/bin/env python
"""Measured VPU ceiling for the fused kernels' op mix (r04 verdict item 8).

Times a Pallas kernel that runs K dependent i32 elementwise ops per
(SUB, LANES) row over the same grid shape as the fused full-env kernel,
giving an empirical ops/s "speed of light" on THIS chip for THIS op mix
(i32 add/xor/shift/select on 8x128 tiles) — the denominator for the
roofline in docs/PERF.md. No specs-sheet numbers: the ceiling is measured
on the same hardware, same grid, same dtype as the kernel under analysis.
"""
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANES = 8, 128
K = 4096          # dependent vector ops per row per grid step
ROWS = 8          # independent chains (keeps the VPU pipeline fed)


def kernel(x_ref, o_ref):
    rows = [x_ref[r] for r in range(ROWS)]
    c1 = jnp.full((SUB, LANES), 0x9E3779B9, jnp.int32)
    for i in range(K // (4 * ROWS)):
        for r in range(ROWS):
            v = rows[r]
            v = v + c1                       # add
            v = v ^ (v << 13)                # xor + shift
            v = jnp.where(v > 0, v, v + 7)   # compare + select
            rows[r] = v
    for r in range(ROWS):
        o_ref[r] = rows[r]


def main():
    n_tiles = 64  # same grid occupancy class as the 65536-env kernel
    x = jnp.ones((n_tiles, ROWS, SUB, LANES), jnp.int32)
    f = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, ROWS, SUB, LANES),
                               lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, ROWS, SUB, LANES), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, ROWS, SUB, LANES),
                                       jnp.int32),
    )
    jf = jax.jit(f)
    float(jf(x)[0, 0, 0, 0])  # compile + sync
    # ops per call: K/(4*ROWS) * ROWS * 6 primitive ops * n_tiles
    ops_per_tile = (K // (4 * ROWS)) * ROWS * 6
    reps = 200
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = jf(x)
        float(out[0, 0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    tile_ops_per_s = reps * n_tiles * ops_per_tile / best
    print(json.dumps({
        "vector_row_ops_per_s": round(tile_ops_per_s),
        "note": "one op = one (8,128) i32 elementwise primitive; "
                f"{ops_per_tile} dependent ops/tile/call, {n_tiles} tiles, "
                f"best of 3 x {reps} reps",
    }))


if __name__ == "__main__":
    main()
