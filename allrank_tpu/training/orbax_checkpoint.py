"""Orbax checkpoint backend: async, sharding-aware train-state snapshots.

The default ``npz`` backend (checkpoint.py) gathers every array to host and
writes synchronously — fine for one chip and small towers, but on a pod it
serializes a full all-gather of model+optimizer state into the step stream.
This backend (``training.checkpoint_backend: "orbax"``) uses
``orbax.checkpoint.StandardCheckpointer``:

  * **async**: device→host copies happen in ``save()``, the file write
    proceeds in the background and the epoch loop continues immediately;
  * **sharded**: each process writes exactly its own shards (OCDBT), and
    restore is sharding-aware — arrays land back on their devices with the
    layout taken from the live template, no host-side gather either way.

Scope: the partial (mid-training) params+opt-state snapshot. Loop state
(scheduler/early-stop/PRNG) stays in ``loop_state.json`` — tiny, host-side
— and the *final* ``model.npz`` artifact keeps the portable npz format that
``rank_and_click``/serving load (reference analog: the final state_dict at
allrank/training/train_utils.py:139).
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import numpy as np

STATE_DIR = "orbax_state"


def _is_saveable(leaf: Any) -> bool:
    return isinstance(leaf, (jax.Array, np.ndarray))


class OrbaxTrainCheckpointer:
    """Save/restore ``{"params", "opt_state"}`` under ``<partial>/orbax_state``.

    Non-array optimizer leaves (e.g. injected schedule callables) are
    stored as None and re-filled from the live template on restore — the
    same policy as the npz backend's ``save_opt_state``/``strict=False``.
    """

    def __init__(self) -> None:
        import orbax.checkpoint as ocp

        self._ckptr = ocp.StandardCheckpointer()

    def save(self, partial_dir: str, params: Any, opt_state: Any) -> None:
        state = {
            "params": params,
            "opt_state": jax.tree.map(
                lambda v: v if _is_saveable(v) else None, opt_state
            ),
        }
        self._ckptr.save(
            os.path.join(os.path.abspath(partial_dir), STATE_DIR),
            state, force=True,
        )

    def restore(self, partial_dir: str, params_template: Any,
                opt_state_template: Any) -> Tuple[Any, Any]:
        def abstract(v):
            if not _is_saveable(v):
                return None
            v = jax.numpy.asarray(v) if isinstance(v, np.ndarray) else v
            return jax.ShapeDtypeStruct(
                v.shape, v.dtype, sharding=getattr(v, "sharding", None)
            )

        templates = {"params": params_template,
                     "opt_state": opt_state_template}
        restored = self._ckptr.restore(
            os.path.join(os.path.abspath(partial_dir), STATE_DIR),
            jax.tree.map(abstract, templates),
        )
        merged = jax.tree.map(
            lambda r, t: t if r is None else r, restored, templates,
            is_leaf=lambda x: x is None,
        )
        return merged["params"], merged["opt_state"]

    def wait_until_finished(self) -> None:
        self._ckptr.wait_until_finished()

    @staticmethod
    def exists(partial_dir: str) -> bool:
        return os.path.isdir(os.path.join(partial_dir, STATE_DIR))
