"""Flat .npz checkpointing for parameter/optimizer pytrees.

The reference persists torch state_dicts (GausPcgc/train.py:214,226-228;
HAC gaussian_model.py:970-1003). Here pytrees are flattened with their key
paths into a single .npz — dependency-free, format-stable, and directly
inspectable with numpy.
"""

from __future__ import annotations

import pickle

import numpy as np
import jax


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_pytree(path: str, tree) -> None:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {_path_str(kp): np.asarray(jax.device_get(v)) for kp, v in flat}
    np.savez(path, **arrays)


def save_training_checkpoint(path: str, payload: dict) -> None:
    """Persist a full mid-train snapshot (params, rest, opt_state, stats,
    iteration, rng states) for --start_checkpoint resume.

    Parity: HAC/train.py:250-252 torch.save((capture(), iteration)) and
    gaussian_model.py:316-344 restore incl. optimizer state. Pickle keeps
    the optax NamedTuple structure so no template is needed on load;
    arrays are host-ified first so the file is device-free.
    """
    host = jax.tree_util.tree_map(
        lambda v: np.asarray(jax.device_get(v))
        if isinstance(v, (jax.Array, np.ndarray))
        else v,
        payload,
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host, f, protocol=pickle.HIGHEST_PROTOCOL)
    import os

    os.replace(tmp, path)


def load_training_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def load_pytree(path: str, template):
    """Load values saved by save_pytree into the structure of `template`."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    values = []
    for kp, v in flat:
        key = _path_str(kp)
        if key not in data:
            raise KeyError(f"checkpoint missing {key}")
        arr = data[key]
        if arr.shape != np.shape(v):
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {np.shape(v)}")
        values.append(arr)
    return jax.tree_util.tree_unflatten(treedef, values)
