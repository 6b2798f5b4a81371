"""Parameter checkpointing: params pytree <-> a single .npz file.

The reference saves only the final ``state_dict`` pickle
(reference: allrank/training/train_utils.py:139) and reloads it for
rank-and-click (allrank/models/model_utils.py:56-60). Here the format is a
flat npz keyed by tree path — portable, mmap-able, no pickle execution risk —
with GCS download support on load. Optimizer state uses the same mechanism,
enabling mid-training resume (a capability the reference lacks).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from allrank_tpu.utils.file_utils import copy_file_to_local, is_gs_path

_SEP = "|"


def _path_key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return _SEP.join(parts)


def save_params(params: Any, path: str) -> str:
    """Write a params pytree as ``{tree_path: ndarray}`` npz; returns path."""
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {_path_key(p): np.asarray(v) for p, v in leaves}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        np.savez(f, **arrays)
    return path


def load_params(template: Any, path: str, strict: bool = True) -> Any:
    """Load an npz checkpoint into the structure of ``template`` (a pytree
    with the same architecture, e.g. freshly initialized params).

    ``strict=False`` keeps the template's value for leaves absent from the
    file (used for optimizer state, where non-array leaves are not saved)."""
    if is_gs_path(path):
        path = copy_file_to_local(path)
    with np.load(path) as data:
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        loaded = []
        for p, leaf in leaves:
            key = _path_key(p)
            if key not in data:
                if not strict:
                    loaded.append(leaf)
                    continue
                raise KeyError(f"checkpoint {path} is missing parameter '{key}'")
            arr = data[key]
            if arr.shape != tuple(np.shape(leaf)):
                raise ValueError(
                    f"shape mismatch for '{key}': checkpoint {arr.shape} "
                    f"vs model {np.shape(leaf)}"
                )
            loaded.append(arr)
    return jax.tree_util.tree_unflatten(treedef, loaded)


def save_opt_state(opt_state: Any, path: str) -> Optional[str]:
    """Optimizer-state save. Non-array leaves are skipped individually (they
    are reconstructed from the fresh template on resume via
    ``load_params(..., strict=False)``); skipped keys are logged so a resume
    surprise is visible at save time, not load time."""
    leaves, _ = jax.tree_util.tree_flatten_with_path(opt_state)
    arrays = {}
    skipped = []
    for p, v in leaves:
        try:
            arrays[_path_key(p)] = np.asarray(v)
        except (TypeError, ValueError):
            skipped.append(_path_key(p))
    if skipped:
        from allrank_tpu.utils.ltr_logging import get_logger

        get_logger().warning(
            "opt-state leaves not serializable, resume will re-init them: %s",
            skipped,
        )
    with open(path, "wb") as f:
        np.savez(f, **arrays)
    return path
