"""Checkpoint / resume for temporal history and optimizer state.

The reference has no persistence (SURVEY.md §5 checkpoint row); the state
worth checkpointing here is the SVGF temporal ``History`` (accumulated color /
moments / length / prev G-buffer) mid-sequence, plus the ``TrainState`` of an
optimization run.  Uses orbax when importable, plain ``np.savez`` otherwise —
both write the same logical pytree-of-arrays layout.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save(path: str, tree: Any) -> None:
    """Save a pytree of arrays to ``path`` (.npz archive)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_flatten(tree))


def restore(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save`, shaped like ``like``."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    flat = dict(data.items())
    leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for lpath, leaf in leaves:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p))) for p in lpath)
        if key not in flat:
            raise KeyError(f"checkpoint {path} missing leaf {key!r}")
        arr = flat[key]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"leaf {key!r} shape {arr.shape} != expected {tuple(leaf.shape)}")
        new_leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_orbax(path: str, tree: Any) -> None:
    """Orbax variant (directory-based, async-capable).

    Falls back to .npz only when orbax itself is not importable; real orbax
    failures (bad path, serialization errors) propagate — silently degrading
    a production checkpoint to a different on-disk format would corrupt
    resume expectations.  Tested in tests/test_utils_cli.py.
    """
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        save(path, tree)
        return
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def restore_orbax(path: str, like: Any) -> Any:
    """Restore an orbax checkpoint written by :func:`save_orbax`.

    .npz fallback applies only when orbax is not importable (matching
    :func:`save_orbax`'s write-side fallback).
    """
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return restore(path, like)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
