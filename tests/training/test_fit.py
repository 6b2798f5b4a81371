"""End-to-end training tests: fit() on dummy data, DP sharding on the 8-device
CPU mesh, checkpoint round-trip, and the full CLI run with the
expected-metrics gate (the reference's integration path,
reference: scripts/run_example.sh + allrank/utils/experiments.py:36-43)."""

import json
import os

import jax
import numpy as np
import pytest

from allrank_tpu.config import Config
from allrank_tpu.data.batching import SlateBatcher
from allrank_tpu.data.dataset import SlateDataset
from allrank_tpu.data.dummy import generate_dummy_data, write_dummy_dataset
from allrank_tpu.losses import get_loss
from allrank_tpu.models.factory import init_params, make_model
from allrank_tpu.parallel import batch_shardings, make_mesh, param_shardings
from allrank_tpu.training import (
    fit,
    load_params,
    make_optimizer,
    make_scheduler,
    save_params,
)


def _dummy_dataset(num_queries=64, results_len=12, num_features=16, seed=7):
    rng = np.random.RandomState(seed)
    X, y, qid = generate_dummy_data(num_queries, results_len, 5, num_features, rng)
    return SlateDataset(X.astype(np.float32), y.astype(np.float32), qid)


def _fit_kwargs(ds, mdef, loss_name="listNet", loss_args=None, **overrides):
    loss_fn, needs_rng = get_loss(loss_name)
    optimizer = make_optimizer("Adam", {"lr": 1e-2})
    kwargs = dict(
        epochs=4,
        params=init_params(jax.random.PRNGKey(0), mdef),
        mdef=mdef,
        loss_fn=loss_fn,
        loss_kwargs=loss_args or {},
        needs_rng=needs_rng,
        optimizer=optimizer,
        scheduler=make_scheduler("StepLR", {"step_size": 10, "gamma": 0.1}, 1e-2),
        train_batcher=SlateBatcher(ds, 12, 16, shuffle=True, seed=1),
        val_batcher=SlateBatcher(ds, 12, 16, shuffle=False, seed=1),
        metrics={"ndcg": [5], "mrr": [10]},
        val_metric="ndcg_5",
        early_stopping_patience=0,
        gradient_clipping_norm=1.0,
    )
    kwargs.update(overrides)
    return kwargs


def test_fit_learns_on_dummy_data():
    ds = _dummy_dataset()
    from allrank_tpu.config import FCConfig, ModelConfig, PostModelConfig

    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[32], input_norm=False, activation="ReLU", dropout=0.0),
            transformer=None,
            post_model=PostModelConfig(d_output=1),
        ),
        n_features=16,
    )
    result = fit(**_fit_kwargs(ds, mdef))
    assert result["epochs"] == 4
    assert result["num_params"] > 0
    # dummy labels are a noisy function of the mean feature -> very learnable
    assert result["val_metrics"]["ndcg_5"] > 0.75
    assert 0.0 < result["val_metrics"]["mrr_10"] <= 1.0


def test_fit_data_parallel_multichip_matches_metrics():
    """Same tiny run on a 4-way data-parallel mesh: executes and produces a
    sane metric (8 virtual CPU devices from conftest)."""
    from allrank_tpu.config import FCConfig, ModelConfig, ParallelConfig, PostModelConfig

    ds = _dummy_dataset()
    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[32], input_norm=False, activation="ReLU", dropout=0.0),
            transformer=None,
            post_model=PostModelConfig(d_output=1),
        ),
        n_features=16,
    )
    mesh = make_mesh(ParallelConfig(data=4, model=1))
    kwargs = _fit_kwargs(ds, mdef)
    kwargs["params"] = jax.device_put(
        kwargs["params"], param_shardings(kwargs["params"], mesh)
    )
    with mesh:
        result = fit(batch_shardings=batch_shardings(mesh), **kwargs)
    assert result["val_metrics"]["ndcg_5"] > 0.75


def test_checkpoint_roundtrip(tmp_path):
    from allrank_tpu.config import FCConfig, ModelConfig, PostModelConfig

    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[8, 4], input_norm=True, activation="Tanh", dropout=0.1),
            transformer=None,
            post_model=PostModelConfig(d_output=1),
        ),
        n_features=5,
    )
    params = init_params(jax.random.PRNGKey(3), mdef)
    path = save_params(params, str(tmp_path / "model.npz"))
    template = init_params(jax.random.PRNGKey(99), mdef)  # different values
    restored = load_params(template, path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _tiny_config_dict(data_path):
    """The run_example config shape (reference: scripts/local_config.json) at
    test scale: 1-block transformer + ordinal loss on dummy data."""
    return {
        "model": {
            "fc_model": {"sizes": [24], "input_norm": False, "activation": None,
                         "dropout": None},
            "transformer": {
                "N": 1, "d_ff": 32, "h": 2,
                "positional_encoding": None, "dropout": 0.0,
            },
            "post_model": {"d_output": 4, "output_activation": "Sigmoid"},
        },
        "data": {
            "path": data_path, "num_workers": 0, "batch_size": 16,
            "slate_length": 12, "validation_ds_role": "vali",
        },
        "optimizer": {"name": "Adam", "args": {"lr": 1e-2}},
        "lr_scheduler": {"name": "StepLR", "args": {"step_size": 10, "gamma": 0.1}},
        "training": {"epochs": 4, "gradient_clipping_norm": None,
                     "early_stopping_patience": 0},
        "loss": {"name": "ordinal", "args": {"n": 4}},
        "metrics": ["ndcg_5", "ndcg_10", "mrr_5"],
        "val_metric": "ndcg_5",
        "expected_metrics": {"val": {"ndcg_5": 0.7}},
    }


def test_cli_run_end_to_end(tmp_path):
    """python -m allrank_tpu.main equivalent: full train -> dump -> gate."""
    from argparse import Namespace

    from allrank_tpu.main import run

    data_dir = str(tmp_path / "dummy_data")
    write_dummy_dataset(data_dir, num_queries=64, results_len=12, num_features=16)

    config_path = str(tmp_path / "config.json")
    with open(config_path, "w") as f:
        json.dump(_tiny_config_dict(data_dir), f)

    job_dir = str(tmp_path / "job")
    result = run(Namespace(job_dir=job_dir, run_id="test_run",
                           config_file_name=config_path))
    assert result["val_metrics"]["ndcg_5"] > 0.7  # the gate also asserted this

    out_dir = os.path.join(job_dir, "results", "test_run")
    assert os.path.exists(os.path.join(out_dir, "experiment_result.json"))
    assert os.path.exists(os.path.join(out_dir, "model.npz"))
    assert os.path.exists(os.path.join(out_dir, "used_config.json"))
    with open(os.path.join(out_dir, "experiment_result.json")) as f:
        dumped = json.load(f)
    assert dumped["run_id"] == "test_run"
    assert "val_metrics/ndcg_5" in dumped


def test_cli_gate_failure_raises(tmp_path):
    from argparse import Namespace

    from allrank_tpu.main import run

    data_dir = str(tmp_path / "dummy_data")
    write_dummy_dataset(data_dir, num_queries=32, results_len=12, num_features=16)
    cfg = _tiny_config_dict(data_dir)
    cfg["training"]["epochs"] = 1
    cfg["expected_metrics"] = {"val": {"ndcg_5": 1.01}}  # impossible
    config_path = str(tmp_path / "config.json")
    with open(config_path, "w") as f:
        json.dump(cfg, f)
    with pytest.raises(AssertionError):
        run(Namespace(job_dir=str(tmp_path / "job"), run_id="fail_run",
                      config_file_name=config_path))


def test_cli_warm_start_init_from(tmp_path):
    """training.init_from loads weights before training (fine-tune path for
    checkpoints imported from the reference). With lr=0 the warm-started
    run's final model must equal the source checkpoint bit-for-bit."""
    from argparse import Namespace

    from allrank_tpu.main import run

    data_dir = str(tmp_path / "dummy_data")
    write_dummy_dataset(data_dir, num_queries=32, results_len=12, num_features=16)

    cfg = _tiny_config_dict(data_dir)
    cfg["training"]["epochs"] = 1
    cfg["expected_metrics"] = {}
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    job_dir = str(tmp_path / "job")
    run(Namespace(job_dir=job_dir, run_id="source", config_file_name=cfg_path))
    source_npz = os.path.join(job_dir, "results", "source", "model.npz")

    cfg["training"]["init_from"] = source_npz
    cfg["optimizer"] = {"name": "Adam", "args": {"lr": 0.0}}
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    run(Namespace(job_dir=job_dir, run_id="warm", config_file_name=cfg_path))
    warm_npz = os.path.join(job_dir, "results", "warm", "model.npz")

    with np.load(source_npz) as a, np.load(warm_npz) as b:
        assert sorted(a.files) == sorted(b.files)
        for k in a.files:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
