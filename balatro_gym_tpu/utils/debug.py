"""Debug-mode guards (SURVEY §5: checkify/NaN/OOB in debug, zero cost in prod).

The reference contains no sanitizers (single-threaded Python). The TPU-native
equivalent: wrap any pure step/update in ``checkify`` to surface NaNs, OOB
indices and div-by-zero as structured errors in debug runs, while production
jits stay unchanged.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
from jax.experimental import checkify

CHECKS = checkify.float_checks | checkify.index_checks | checkify.nan_checks


def checked(fn: Callable, *, jit: bool = True) -> Callable:
    """Return a wrapped fn that raises on NaN / OOB / float errors.

    The wrapper returns the original outputs; errors raise ValueError with
    the checkify report. Use in tests and debug sessions only.
    """
    cfn = checkify.checkify(fn, errors=CHECKS)
    if jit:
        cfn = jax.jit(cfn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite_tree(tree, name: str = "tree") -> None:
    """Host-side finite check over every float leaf of a pytree."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise ValueError(f"non-finite values in {name}{jax.tree_util.keystr(path)}")
