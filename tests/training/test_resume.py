"""Mid-training checkpoint + resume (a capability the reference lacks —
it only saves a final state_dict, reference train_utils.py:139)."""

import os

import jax
import numpy as np

from allrank_tpu.config import FCConfig, ModelConfig, PostModelConfig
from allrank_tpu.data.batching import SlateBatcher
from allrank_tpu.data.dataset import SlateDataset
from allrank_tpu.data.dummy import generate_dummy_data
from allrank_tpu.losses import get_loss
from allrank_tpu.models.factory import init_params, make_model
from allrank_tpu.training import fit, make_optimizer, make_scheduler


def _setup():
    rng = np.random.RandomState(3)
    X, y, qid = generate_dummy_data(48, 10, 5, 12, rng)
    ds = SlateDataset(X.astype(np.float32), y.astype(np.float32), qid)
    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[16], input_norm=False, activation="ReLU",
                              dropout=0.0),
            transformer=None,
            post_model=PostModelConfig(d_output=1),
        ),
        n_features=12,
    )
    return ds, mdef


def _fit(ds, mdef, out_dir, epochs, loss="listNet", **kw):
    loss_fn, needs_rng = get_loss(loss)
    return fit(
        epochs=epochs,
        params=init_params(jax.random.PRNGKey(0), mdef),
        mdef=mdef,
        loss_fn=loss_fn,
        loss_kwargs={},
        needs_rng=needs_rng,
        optimizer=make_optimizer("Adam", {"lr": 1e-2}),
        scheduler=make_scheduler("StepLR", {"step_size": 2, "gamma": 0.5}, 1e-2),
        train_batcher=SlateBatcher(ds, 10, 16, shuffle=True, seed=1),
        val_batcher=SlateBatcher(ds, 10, 16, shuffle=False, seed=1),
        metrics={"ndcg": [5]},
        val_metric="ndcg_5",
        early_stopping_patience=0,
        gradient_clipping_norm=None,
        output_dir=out_dir,
        **kw,
    )


def test_checkpoint_every_writes_partial_state(tmp_path):
    ds, mdef = _setup()
    _fit(ds, mdef, str(tmp_path), epochs=4, checkpoint_every=2)
    partial = tmp_path / "partial"
    assert (partial / "params.npz").exists()
    assert (partial / "opt_state.npz").exists()
    assert (partial / "loop_state.json").exists()


def test_resume_continues_and_matches_uninterrupted_run(tmp_path):
    ds, mdef = _setup()
    full_dir = str(tmp_path / "full")
    os.makedirs(full_dir)
    full = _fit(ds, mdef, full_dir, epochs=6)

    # interrupted run: 3 epochs with checkpointing, then resume to 6
    part_dir = str(tmp_path / "interrupted")
    os.makedirs(part_dir)
    _fit(ds, mdef, part_dir, epochs=3, checkpoint_every=3)
    resumed = _fit(ds, mdef, part_dir, epochs=6, checkpoint_every=3, resume=True)

    assert resumed["epochs"] == 6
    # same data order (epoch-seeded shuffles) and same update rule -> the
    # resumed run must land close to the uninterrupted one
    assert abs(resumed["val_metrics"]["ndcg_5"] - full["val_metrics"]["ndcg_5"]) < 0.05


import pytest


@pytest.mark.parametrize("backend", ["npz", "orbax"])
def test_resume_is_bit_reproducible_with_rng_loss(tmp_path, backend):
    """The training PRNG stream is checkpointed: a resumed run of an
    rng-consuming loss (listMLE's tie shuffle) matches the uninterrupted run
    parameter-for-parameter — under both checkpoint backends (npz and the
    async sharded orbax one)."""
    ds, mdef = _setup()
    full_dir = str(tmp_path / "full")
    os.makedirs(full_dir)
    full = _fit(ds, mdef, full_dir, epochs=4, loss="listMLE")

    part_dir = str(tmp_path / "interrupted")
    os.makedirs(part_dir)
    _fit(ds, mdef, part_dir, epochs=2, loss="listMLE", checkpoint_every=2,
         checkpoint_backend=backend)
    if backend == "orbax":
        from allrank_tpu.training.orbax_checkpoint import (
            OrbaxTrainCheckpointer,
        )

        assert OrbaxTrainCheckpointer.exists(
            os.path.join(part_dir, "partial"))
    resumed = _fit(ds, mdef, part_dir, epochs=4, loss="listMLE",
                   checkpoint_every=2, resume=True,
                   checkpoint_backend=backend)

    for a, b in zip(jax.tree.leaves(full["params"]),
                    jax.tree.leaves(resumed["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
