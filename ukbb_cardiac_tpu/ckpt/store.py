"""Native model bundle store (.npz + JSON metadata).

The reference's model contract is a TF-1.x checkpoint triplet whose .meta
graph *is* the architecture (``common/deploy_network.py:48-49``).  Our
native format stores the same contract explicitly: a JSON header with the
model kind / config / layer-name structure, and every weight tensor as an
npz entry.  One file, no framework dependency, memory-mappable.

``ckpt/tf_reader.py`` converts the reference's released TF checkpoints
into this format.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ukbb_cardiac_tpu.models import fcn as fcn_mod
from ukbb_cardiac_tpu.models import unet as unet_mod

_META_KEY = "__meta__"


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, key + "/"))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_model(path: str, kind: str, cfg, names, params, state,
               extra_meta: dict | None = None, opt_state=None) -> None:
    """Write a model bundle. ``kind`` in {'fcn','resnet','unet',
    'temporal_unet','unet_lstm'}; cfg a dataclass; names the layer-name
    structure produced by the model's init function.

    ``opt_state``: optional optax state for training resume — stored as
    flattened leaves; restored positionally into a freshly-initialised
    optimizer state of the same structure (see :func:`load_opt_state`).
    """
    meta = {
        "format": "ukbb_cardiac_tpu.model_bundle.v1",
        "kind": kind,
        "cfg": dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) else dict(cfg),
        "names": names,
        "extra": extra_meta or {},
    }
    arrays = {}
    for name, tree in (("params", params), ("state", state)):
        for k, v in _flatten(tree, name + "/").items():
            arrays[k] = v
    if opt_state is not None:
        import jax

        leaves = jax.tree_util.tree_leaves(opt_state)
        meta["n_opt_leaves"] = len(leaves)
        for i, leaf in enumerate(leaves):
            arrays[f"opt/{i}"] = np.asarray(leaf)
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_opt_state(path: str, opt_state_template):
    """Restore an optax state saved by :func:`save_model` into a freshly
    initialised state of identical structure (positional leaf match).
    Returns None if the bundle has no optimizer state."""
    import jax

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z[_META_KEY].tobytes()).decode("utf-8"))
        n = meta.get("n_opt_leaves")
        if n is None:
            return None
        leaves = [jnp.asarray(z[f"opt/{i}"]) for i in range(n)]
    treedef = jax.tree_util.tree_structure(opt_state_template)
    template_leaves = jax.tree_util.tree_leaves(opt_state_template)
    if len(template_leaves) != len(leaves):
        raise ValueError(f"optimizer structure mismatch: "
                         f"{len(template_leaves)} vs {len(leaves)} leaves")
    # preserve weak scalar types (e.g. optax step counters)
    leaves = [l.astype(np.asarray(t).dtype) for l, t in
              zip(leaves, template_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


_CFG_TYPES = {
    "fcn": fcn_mod.FCNConfig,
    "resnet": fcn_mod.ResNetConfig,
    "unet": unet_mod.UNetConfig,
    "temporal_unet": unet_mod.UNetConfig,
    "unet_lstm": unet_mod.UNetConfig,
}


def _tuplize_names(obj):
    """JSON round-trips tuples as lists; restore (cname, bname) leaf pairs
    to tuples so loaded names hash/compare like freshly-built ones."""
    if isinstance(obj, list):
        if len(obj) == 2 and all(isinstance(x, str) for x in obj):
            return tuple(obj)
        return [_tuplize_names(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _tuplize_names(v) for k, v in obj.items()}
    return obj


def load_model(path: str) -> Tuple[str, Any, Any, Dict, Dict, Dict]:
    """Read a model bundle -> (kind, cfg, names, params, state, extra)."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z[_META_KEY].tobytes()).decode("utf-8"))
        flat_p, flat_s = {}, {}
        for key in z.files:
            if key == _META_KEY:
                continue
            if key.startswith("params/"):
                flat_p[key[len("params/"):]] = z[key]
            elif key.startswith("state/"):
                flat_s[key[len("state/"):]] = z[key]
    kind = meta["kind"]
    cfg_cls = _CFG_TYPES.get(kind)
    cfg_dict = meta["cfg"]
    if cfg_cls is not None:
        fields = {f.name for f in dataclasses.fields(cfg_cls)}
        cfg = cfg_cls(**{k: (tuple(v) if isinstance(v, list) else v)
                         for k, v in cfg_dict.items() if k in fields})
    else:
        cfg = cfg_dict
    names = _tuplize_names(meta["names"])
    return kind, cfg, names, _unflatten(flat_p), _unflatten(flat_s), meta.get("extra", {})
