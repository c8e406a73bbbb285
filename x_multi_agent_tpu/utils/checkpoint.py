"""Checkpoint / resume for the full filter state.

The reference has no checkpointing (SURVEY §5.4); its closest artifacts are
the replayable state buffer and the Keyframe serialization. Here the whole
system state — FilterState (ring buffer + covariance + vision state),
TrackSlots, keyframe DB, photometric state — is a pytree, so checkpointing
is a flat array dump + reload against a structural template.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np


def save(path: str, pytree: Any) -> None:
    leaves, _ = jax.tree.flatten(pytree)
    np.savez_compressed(
        path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    )


def load(path: str, template: Any) -> Any:
    """Restore into the structure (and dtypes/shapes) of ``template``."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    restored = []
    for i, t in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        t_arr = np.asarray(t)
        if arr.shape != t_arr.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template {t_arr.shape}"
            )
        restored.append(jax.numpy.asarray(arr.astype(t_arr.dtype)))
    return jax.tree.unflatten(treedef, restored)
