"""Torch (spconv) checkpoint -> flax variables converter.

The shipped reference checkpoints (noble-elevator-58 / peach-forest-65,
reference smart_tree/model/weights/, layout documented in SURVEY.md §2.1)
are plain state_dicts of spconv modules. Our module names were chosen to
mirror that layout, so conversion is: join flax tree paths with '.', rename
BN params (scale->weight, mean->running_mean, var->running_var), and
transpose conv kernels from spconv's (Cout, kx, ky, kz, Cin) to our
[K3, Cin, Cout] (kx-major flatten — same spatial order).

Also provides `load_torch_state_dict` that reads a .pt file without torch
if necessary (torch cpu is available in dev; orbax/npz snapshots are the
deployment format — see scripts in tools/).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


_BN_RENAME_PARAMS = {"scale": "weight", "bias": "bias"}
_BN_RENAME_STATS = {"mean": "running_mean", "var": "running_var"}


def _flatten(tree: Dict[str, Any], prefix=()) -> Dict[tuple, Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[tuple, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for path, v in flat.items():
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return out


def torch_key_for(path: tuple, collection: str) -> str:
    """Map a flax tree path to the reference state_dict key."""
    *mods, leaf = path
    if collection == "batch_stats":
        leaf = _BN_RENAME_STATS[leaf]
    elif leaf in ("scale",):
        leaf = "weight"
    return ".".join(list(mods) + [leaf])


def convert_state_dict(
    state_dict: Dict[str, np.ndarray], variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Fill a flax variables template (from model.init) with torch weights.

    state_dict values may be torch tensors or numpy arrays.
    """
    sd = {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    used = set()
    new_vars: Dict[str, Any] = {}
    for collection, tree in variables.items():
        flat = _flatten(tree)
        out = {}
        for path, template in flat.items():
            tkey = torch_key_for(path, collection)
            if tkey not in sd:
                raise KeyError(f"checkpoint missing {tkey} for flax path {path}")
            w = sd[tkey]
            used.add(tkey)
            if w.ndim == 5:  # conv kernel (Cout, kx, ky, kz, Cin) -> [K3,Cin,Cout]
                cout, kx, ky, kz, cin = w.shape
                w = w.transpose(1, 2, 3, 4, 0).reshape(kx * ky * kz, cin, cout)
            if w.shape != np.shape(template):
                raise ValueError(
                    f"{tkey}: shape {w.shape} != template {np.shape(template)}"
                )
            out[path] = w.astype(np.asarray(template).dtype)
        new_vars[collection] = _unflatten(out)
    extra = {
        k for k in sd
        if k not in used and not k.endswith("num_batches_tracked")
    }
    if extra:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(extra)[:8]}...")
    return new_vars


def load_torch_weights(path) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def save_npz(path, variables: Dict[str, Any]) -> None:
    flat = {}
    for collection, tree in variables.items():
        for p, v in _flatten(tree).items():
            flat[collection + "/" + "/".join(p)] = np.asarray(v)
    np.savez_compressed(path, **flat)


def load_npz(path) -> Dict[str, Any]:
    out: Dict[tuple, Any] = {}
    with np.load(path) as data:
        for k in data.files:
            parts = tuple(k.split("/"))
            out[parts] = data[k]
    tree: Dict[str, Any] = {}
    for parts, v in out.items():
        node = tree
        for k in parts[:-1]:
            node = node.setdefault(k, {})
        node[parts[-1]] = v
    return tree
