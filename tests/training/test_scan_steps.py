"""Device-side multi-batch scan: identical optimization trajectory to the
per-batch dispatch path, including the all-dummy tail-padding skip."""

import jax
import numpy as np
import pytest

from allrank_tpu.config import FCConfig, ModelConfig, ParallelConfig, PostModelConfig
from allrank_tpu.data.batching import SlateBatcher
from allrank_tpu.data.dataset import SlateDataset
from allrank_tpu.data.dummy import generate_dummy_data
from allrank_tpu.losses import get_loss
from allrank_tpu.models.factory import init_params, make_model
from allrank_tpu.parallel import batch_shardings, make_mesh, param_shardings
from allrank_tpu.training import fit, make_optimizer, make_scheduler


def _setup(n_queries=40):
    rng = np.random.RandomState(5)
    X, y, qid = generate_dummy_data(n_queries, 8, 5, 10, rng)
    ds = SlateDataset(X.astype(np.float32), y.astype(np.float32), qid)
    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[12], input_norm=False, activation="ReLU",
                              dropout=0.0),
            transformer=None,
            post_model=PostModelConfig(d_output=1),
        ),
        n_features=10,
    )
    return ds, mdef


def _fit(ds, mdef, scan_steps, **overrides):
    loss_fn, needs_rng = get_loss("listNet")
    kwargs = dict(
        epochs=3,
        params=init_params(jax.random.PRNGKey(0), mdef),
        mdef=mdef,
        loss_fn=loss_fn,
        loss_kwargs={},
        needs_rng=needs_rng,
        optimizer=make_optimizer("Adam", {"lr": 1e-2}),
        scheduler=make_scheduler("StepLR", {"step_size": 10, "gamma": 0.1}, 1e-2),
        train_batcher=SlateBatcher(ds, 8, 16, shuffle=True, seed=1),
        val_batcher=SlateBatcher(ds, 8, 16, shuffle=False, seed=1),
        metrics={"ndcg": [5]},
        val_metric="ndcg_5",
        early_stopping_patience=0,
        gradient_clipping_norm=1.0,
        scan_steps=scan_steps,
    )
    kwargs.update(overrides)
    return fit(**kwargs)


@pytest.mark.parametrize("scan_steps", [2, 4])
def test_scan_steps_matches_per_batch_training(scan_steps):
    # 40 queries / batch 16 -> 3 batches/epoch: scan groups get tail padding
    ds, mdef = _setup()
    base = _fit(ds, mdef, scan_steps=1)
    scanned = _fit(ds, mdef, scan_steps=scan_steps)
    # same data order + same PRNG stream -> identical trajectories
    assert scanned["val_metrics"]["ndcg_5"] == pytest.approx(
        base["val_metrics"]["ndcg_5"], abs=1e-6
    )


def test_scan_steps_on_mesh():
    ds, mdef = _setup(n_queries=64)
    mesh = make_mesh(ParallelConfig(data=4, model=1))
    params = jax.device_put(
        init_params(jax.random.PRNGKey(0), mdef),
        param_shardings(init_params(jax.random.PRNGKey(0), mdef), mesh),
    )
    with mesh:
        result = _fit(ds, mdef, scan_steps=2, params=params,
                      batch_shardings=batch_shardings(mesh))
    assert 0.0 < result["val_metrics"]["ndcg_5"] <= 1.0
