"""Full training-state checkpointing.

The reference checkpoints only weights (bcnn_save_weights every
`save_model` batches, src/cli/bcnn_cl.c:137-140) — Adam m/v, momentum
buffers and the `seen` counter are lost on resume (SURVEY.md §5). This
module adds a complete checkpoint alongside the bit-compatible .bcnnmodel:
params + BN running stats + optimizer state + data-order RNG, in a single
.npz. `Session.save_checkpoint/load_checkpoint` use it; bcnn-cl keeps
writing .bcnnmodel for compatibility.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1


def _flatten(prefix: str, tree: Dict[str, Any], out: Dict[str, np.ndarray]):
    for k, v in tree.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            _flatten(key, v, out)
        else:
            out[key] = np.asarray(v)


def _unflatten(flat: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    plen = len(prefix) + 1
    for key in flat:
        if not key.startswith(prefix + "/"):
            continue
        parts = key[plen:].split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree


def save_checkpoint(path: str, params, state, opt_state, extra=None):
    flat: Dict[str, np.ndarray] = {}
    _flatten("params", params, flat)
    _flatten("state", state, flat)
    if opt_state is not None:
        _flatten("opt", opt_state, flat)
    meta = dict(version=FORMAT_VERSION, extra=extra or {})
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **flat)


def save_checkpoint_orbax(path: str, params, state, opt_state, extra=None):
    """Orbax-backed checkpoint (async-capable, sharded-array aware): the
    right backend for multi-host meshes where a single-host .npz would
    have to gather. `path` must be a directory."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = {
        "params": params,
        "state": state,
        "opt": opt_state or {},
        "extra_json": np.frombuffer(
            json.dumps(dict(version=FORMAT_VERSION, extra=extra or {})).encode(),
            dtype=np.uint8,
        ).copy(),
    }
    import os

    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str):
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    meta = json.loads(bytes(np.asarray(tree["extra_json"]).tobytes()).decode())
    opt = tree.get("opt") or {}
    if opt:
        for k in ("velocity", "adam_m", "adam_v"):
            opt.setdefault(k, {})
    return (
        tree["params"],
        tree["state"],
        opt,
        meta.get("extra", {}),
    )


def load_checkpoint(path: str) -> Tuple[Dict, Dict, Dict, Dict]:
    """Returns (params, state, opt_state, extra) as jnp arrays."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat.pop("__meta__").tobytes()).decode())

    def to_jnp(tree):
        return jax.tree.map(jnp.asarray, tree)

    params = to_jnp(_unflatten(flat, "params"))
    state = to_jnp(_unflatten(flat, "state"))
    opt = to_jnp(_unflatten(flat, "opt"))
    if opt:
        # empty sub-dicts (e.g. adam_m for SGD runs) don't survive the
        # flattening; restore the canonical structure
        for k in ("velocity", "adam_m", "adam_v"):
            opt.setdefault(k, {})
    return params, state, opt, meta.get("extra", {})
