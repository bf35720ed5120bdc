"""Checkpoint / exact resume via orbax.

The reference checkpoints at two levels (SURVEY §5): env state
(save_state/load_state — here the env state IS a pytree, so that level is
free) and training state (SB3 model.save + VecNormalize pickles,
hpc_train.py:101-152). Here one orbax snapshot of the PPO ``TrainState``
covers everything: params, optimizer state, ALL env states, and the PRNG
key — functional purity makes resume bit-exact.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp


def save_train_state(path: str | Path, ts) -> None:
    """Snapshot a TrainState (or any pytree) to `path`."""
    import orbax.checkpoint as ocp

    # orbax cannot serialize extended-dtype PRNG keys: split them out.
    leaves, treedef = jax.tree.flatten(ts)
    payload = {
        f"leaf_{i}": (jax.random.key_data(l) if _is_key(l) else l)
        for i, l in enumerate(leaves)
    }
    meta = {"is_key": [bool(_is_key(l)) for l in leaves]}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).absolute() / "state", payload)
    import json

    (Path(path) / "meta.json").write_text(json.dumps(meta))


def restore_train_state(path: str | Path, ts_like):
    """Restore into the structure of `ts_like` (a template TrainState)."""
    import json

    import orbax.checkpoint as ocp

    leaves, treedef = jax.tree.flatten(ts_like)
    meta = json.loads((Path(path) / "meta.json").read_text())
    template = {
        f"leaf_{i}": (jax.random.key_data(l) if k else l)
        for i, (l, k) in enumerate(zip(leaves, meta["is_key"]))
    }
    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(Path(path).absolute() / "state", template)
    out = []
    for i, (l, k) in enumerate(zip(leaves, meta["is_key"])):
        v = payload[f"leaf_{i}"]
        out.append(jax.random.wrap_key_data(jnp.asarray(v)) if k else v)
    return jax.tree.unflatten(treedef, out)


def _is_key(x) -> bool:
    return jnp.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key)
