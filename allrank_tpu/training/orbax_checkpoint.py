"""Orbax checkpoint backend: async, sharded, crash-safe train snapshots.

The default ``npz`` backend (checkpoint.py) gathers every array to host and
writes synchronously — fine for one chip and small towers, but on a pod it
serializes a full all-gather of model+optimizer state into the step stream.
This backend (``training.checkpoint_backend: "orbax"``) uses
``orbax.checkpoint.StandardCheckpointer``:

  * **async**: device→host copies happen in ``save()``, the file write
    proceeds in the background and the epoch loop continues immediately;
  * **sharded**: each process writes exactly its own shards (OCDBT), and
    restore is sharding-aware — arrays land back on their devices with the
    layout taken from the live template, no host-side gather either way;
  * **crash-safe**: every snapshot goes to a fresh ``orbax_state_e<N>``
    directory with a ``loop_state_e<N>.json`` sidecar written before the
    async write starts; older snapshots are pruned only after a newer one
    has committed. A crash mid-write leaves the previous finalized
    snapshot intact, and resume picks the newest FINALIZED snapshot (via
    orbax's commit marker), not whatever a bare json file claims.

Collective contract: ``save``/``restore`` are multi-process collectives —
EVERY process of a ``jax.distributed`` cluster must call them (orbax
synchronizes internally); only the sidecar json is main-process-only.

Scope: the partial (mid-training) params+opt-state snapshot. The *final*
``model.npz`` artifact keeps the portable npz format that
``rank_and_click``/serving load (reference analog: the final state_dict at
allrank/training/train_utils.py:139).
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

STATE_PREFIX = "orbax_state_e"
SIDECAR_PREFIX = "loop_state_e"


def _is_saveable(leaf: Any) -> bool:
    return isinstance(leaf, (jax.Array, np.ndarray))


def _state_dir(partial_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(partial_dir),
                        f"{STATE_PREFIX}{epoch}")


def _sidecar_path(partial_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(partial_dir),
                        f"{SIDECAR_PREFIX}{epoch}.json")


def _finalized_epochs(partial_dir: str):
    """Epochs with a COMMITTED snapshot and its sidecar, ascending."""
    from orbax.checkpoint import utils as ocp_utils

    out = []
    for d in glob.glob(os.path.join(os.path.abspath(partial_dir),
                                    f"{STATE_PREFIX}*")):
        m = re.fullmatch(rf"{STATE_PREFIX}(\d+)", os.path.basename(d))
        if not m:
            continue
        epoch = int(m.group(1))
        try:
            finalized = ocp_utils.is_checkpoint_finalized(d)
        except Exception:
            finalized = False
        if finalized and os.path.exists(_sidecar_path(partial_dir, epoch)):
            out.append(epoch)
    return sorted(out)


class OrbaxTrainCheckpointer:
    """Save/restore ``{"params", "opt_state"}`` snapshots under
    ``<partial>/orbax_state_e<epoch>``.

    Non-array optimizer leaves (e.g. injected schedule callables) are
    stored as None and re-filled from the live template on restore — the
    same policy as the npz backend's ``save_opt_state``/``strict=False``.
    """

    def __init__(self) -> None:
        import orbax.checkpoint as ocp

        self._ckptr = ocp.StandardCheckpointer()

    def save(self, partial_dir: str, params: Any, opt_state: Any,
             epoch: int, loop_state: Optional[Dict] = None,
             is_main_process: bool = True) -> None:
        """Collective. ``loop_state`` (host-side scheduler/rng dict) is
        written as the snapshot's sidecar by the main process before the
        async array write starts."""
        # ensure the previous async write committed, then drop snapshots
        # older than the newest committed one (the newest stays until the
        # write we are about to start commits)
        self._ckptr.wait_until_finished()
        self._prune(partial_dir, is_main_process)
        if is_main_process and loop_state is not None:
            with open(_sidecar_path(partial_dir, epoch), "w") as f:
                json.dump(loop_state, f)
        state = {
            "params": params,
            "opt_state": jax.tree.map(
                lambda v: v if _is_saveable(v) else None, opt_state
            ),
        }
        self._ckptr.save(_state_dir(partial_dir, epoch), state)

    def _prune(self, partial_dir: str, is_main_process: bool) -> None:
        if not is_main_process:
            return
        finalized = _finalized_epochs(partial_dir)
        for epoch in finalized[:-1]:
            shutil.rmtree(_state_dir(partial_dir, epoch),
                          ignore_errors=True)
            try:
                os.remove(_sidecar_path(partial_dir, epoch))
            except OSError:
                pass
        # crash debris: unfinalized tmp dirs that are not the newest
        # committed snapshot (no write is in flight here — we waited)
        from orbax.checkpoint import utils as ocp_utils

        keep = {_state_dir(partial_dir, e) for e in finalized[-1:]}
        for d in glob.glob(os.path.join(os.path.abspath(partial_dir),
                                        f"{STATE_PREFIX}*")):
            if d in keep:
                continue
            try:
                if not ocp_utils.is_checkpoint_finalized(d):
                    shutil.rmtree(d, ignore_errors=True)
            except Exception:
                shutil.rmtree(d, ignore_errors=True)

    def restore_latest(
        self, partial_dir: str, params_template: Any, opt_state_template: Any
    ) -> Optional[Tuple[Any, Any, int, Dict]]:
        """Collective. Returns (params, opt_state, epoch, loop_state) from
        the newest finalized snapshot, or None when there is none."""
        finalized = _finalized_epochs(partial_dir)
        if not finalized:
            return None
        epoch = finalized[-1]

        templates = {"params": params_template,
                     "opt_state": opt_state_template}

        # restore targets: keep mesh (Named) shardings from the template;
        # re-home every other leaf as mesh-REPLICATED. Freshly-initialized
        # optimizer scalars (e.g. Adam's count) are uncommitted
        # single-device arrays — jit may move those, but a restore makes
        # them COMMITTED, and on a multi-process mesh a committed
        # single-device leaf can no longer enter the global train step
        # (found by the cluster preemption drill,
        # tests/training/test_preemption_drill.py).
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = None
        for leaf in jax.tree.leaves(templates):
            s = getattr(leaf, "sharding", None)
            if isinstance(s, NamedSharding):
                mesh = s.mesh
                break

        def abstract(v):
            if not _is_saveable(v):
                return None
            v = jax.numpy.asarray(v) if isinstance(v, np.ndarray) else v
            sharding = getattr(v, "sharding", None)
            if mesh is not None and not isinstance(sharding, NamedSharding):
                sharding = NamedSharding(mesh, PartitionSpec())
            return jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=sharding)
        restored = self._ckptr.restore(
            _state_dir(partial_dir, epoch),
            jax.tree.map(abstract, templates),
        )
        merged = jax.tree.map(
            lambda r, t: t if r is None else r, restored, templates,
            is_leaf=lambda x: x is None,
        )
        with open(_sidecar_path(partial_dir, epoch)) as f:
            loop_state = json.load(f)
        return merged["params"], merged["opt_state"], epoch, loop_state

    def wait_until_finished(self) -> None:
        self._ckptr.wait_until_finished()

    @staticmethod
    def exists(partial_dir: str) -> bool:
        return bool(_finalized_epochs(partial_dir))
