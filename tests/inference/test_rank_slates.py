"""On-device slate ranking tests (reference: tests/test_rank_slates.py:1-45)
plus the full rank-and-click CLI."""

import json
import os

import jax
import numpy as np

from allrank_tpu.config import FCConfig, ModelConfig, PostModelConfig
from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.data.dataset import SlateDataset
from allrank_tpu.data.dummy import write_dummy_dataset
from allrank_tpu.inference import metrics_on_clicked_slates, rank_slates_dataset
from allrank_tpu.models.factory import init_params, make_model


def _mlp_model(n_features):
    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[8], input_norm=False, activation="ReLU",
                              dropout=0.0),
            transformer=None,
            post_model=PostModelConfig(d_output=1),
        ),
        n_features=n_features,
    )
    return mdef, init_params(jax.random.PRNGKey(0), mdef)


def test_rank_slates_shapes_and_order():
    n_queries, L, F = 7, 5, 4
    rng = np.random.RandomState(0)
    X = rng.randn(n_queries * L, F).astype(np.float32)
    y = rng.randint(0, 3, size=n_queries * L).astype(np.float32)
    qid = np.repeat(np.arange(n_queries), L)
    ds = SlateDataset(X, y, qid)

    mdef, params = _mlp_model(F)
    X_ranked, y_ranked = rank_slates_dataset(ds, L, params, mdef, batch_size=3)

    assert X_ranked.shape == (n_queries, L, F)
    assert y_ranked.shape == (n_queries, L)
    # every ranked slate must be a permutation of the original docs
    orig_label_sets = sorted(np.sort(y[qid == 0]).tolist())
    assert sorted(np.sort(y_ranked[0]).tolist()) == orig_label_sets


def test_rank_slates_puts_padding_last():
    # slates of different lengths -> shorter ones padded; padding must sort last
    X = np.random.RandomState(1).randn(8, 3).astype(np.float32)
    y = np.arange(8, dtype=np.float32) % 3
    qid = np.array([0, 0, 0, 0, 0, 1, 1, 1])
    ds = SlateDataset(X, y, qid)

    mdef, params = _mlp_model(3)
    X_ranked, y_ranked = rank_slates_dataset(ds, 5, params, mdef, batch_size=2)
    assert y_ranked.shape == (2, 5)
    # slate 1 has 3 real docs -> positions 3,4 must be padding
    assert (y_ranked[1, 3:] == PADDED_Y_VALUE).all()
    assert (y_ranked[1, :3] != PADDED_Y_VALUE).all()
    # padded features must be zeros
    assert (X_ranked[1, 3:] == 0).all()


def test_metrics_on_clicked_slates():
    clicked = (
        [np.ones((4, 2)), np.ones((4, 2))],
        [np.array([1, 0, 1, PADDED_Y_VALUE]), np.array([0, 0, 0, 0])],
    )
    rows = list(metrics_on_clicked_slates(clicked))
    assert rows[0]["slate_length"] == 4
    assert rows[0]["no_of_clicks"] == 2
    # clicks at ranks 1 and 3: dcg = 1/log2(2) + 1/log2(4) = 1.5
    assert abs(rows[0]["dcg"] - 1.5) < 1e-6
    # ideal puts both clicks first: idcg = 1 + 1/log2(3)
    expected_ndcg = 1.5 / (1.0 + 1.0 / np.log2(3.0))
    assert abs(rows[0]["ndcg"] - expected_ndcg) < 1e-6
    # zero clicks -> IDCG == 0 -> filler 1.0
    assert rows[1]["ndcg"] == 1.0
    assert rows[1]["dcg"] == 0.0


def test_rank_and_click_cli_end_to_end(tmp_path):
    from argparse import Namespace

    from allrank_tpu.main import run as train_run
    from allrank_tpu.rank_and_click import run as click_run

    data_dir = str(tmp_path / "data")
    write_dummy_dataset(data_dir, num_queries=48, results_len=10, num_features=12)

    config = {
        "model": {
            "fc_model": {"sizes": [16], "input_norm": False, "activation": "ReLU",
                         "dropout": None},
            "transformer": None,
            "post_model": {"d_output": 1},
        },
        "data": {"path": data_dir, "num_workers": 0, "batch_size": 16,
                 "slate_length": 10, "validation_ds_role": "vali"},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-2}},
        "lr_scheduler": {"name": "StepLR", "args": {"step_size": 10, "gamma": 0.1}},
        "training": {"epochs": 2, "gradient_clipping_norm": None,
                     "early_stopping_patience": 0},
        "loss": {"name": "listNet", "args": {}},
        "metrics": ["ndcg_5"],
        "val_metric": "ndcg_5",
        "expected_metrics": {},
        # reference-style fully-qualified click model config — the allrank.
        # prefix is remapped to allrank_tpu. by instantiate_class
        "click_model": {
            "name": "allrank.click_models.cascade_models.DiverseClicksModel",
            "args": {
                "inner_click_model": {
                    "name": "allrank.click_models.cascade_models.BaseCascadeModel",
                    "args": {"eta": 0.0, "threshold": 2},
                },
                "q_percentile": 0.5,
            },
        },
    }
    config_path = str(tmp_path / "config.json")
    with open(config_path, "w") as f:
        json.dump(config, f)

    job_dir = str(tmp_path / "job")
    train_run(Namespace(job_dir=job_dir, run_id="train",
                        config_file_name=config_path))
    model_path = os.path.join(job_dir, "results", "train", "model.npz")
    assert os.path.exists(model_path)

    summaries = click_run(Namespace(
        job_dir=job_dir, run_id="click", config_file_name=config_path,
        input_model_path=model_path, roles=["train", "vali"],
    ))
    out_dir = os.path.join(job_dir, "results", "click")
    for role in ("train", "vali"):
        assert os.path.exists(os.path.join(out_dir, f"{role}.txt"))
        assert os.path.exists(os.path.join(out_dir, f"{role}_metrics.csv"))
        assert os.path.exists(os.path.join(out_dir, f"{role}_metrics_mean.csv"))
        assert summaries[role]["no_of_clicks"] > 0

    # the clickthrough dataset must load back as valid libsvm slates
    clicked_ds = SlateDataset.from_svm_file(os.path.join(out_dir, "train.txt"))
    assert clicked_ds.n_features == 12
    labels = np.concatenate([clicked_ds[i][1] for i in range(len(clicked_ds))])
    assert set(np.unique(labels)).issubset({0.0, 1.0})


def test_indexed_rank_matches_materializing_path():
    """Index-mode ranking (device feature store + ranked row ids) must be
    value-identical to the materializing path — ragged slates included."""
    from allrank_tpu.inference.inference_utils import (
        rank_slates_dataset_indexed,
    )

    rng = np.random.RandomState(3)
    lengths = [5, 2, 7, 4, 7, 1]
    X = rng.randn(sum(lengths), 4).astype(np.float32)
    y = rng.randint(0, 3, size=sum(lengths)).astype(np.float32)
    qid = np.repeat(np.arange(len(lengths)), lengths)
    ds = SlateDataset(X, y, qid)

    mdef, params = _mlp_model(4)
    L = 7
    X_a, y_a = rank_slates_dataset(ds, L, params, mdef, batch_size=4)
    X_b, y_b = rank_slates_dataset_indexed(ds, L, params, mdef, batch_size=4)
    np.testing.assert_array_equal(y_a, y_b)
    np.testing.assert_array_equal(X_a, X_b)


def test_indexed_rank_and_click_matches_materializing_path():
    from allrank_tpu.click_models.base import OnlyRelevantClickModel
    from allrank_tpu.click_models.jax_models import as_device_click_fn
    from allrank_tpu.inference.inference_utils import (
        rank_and_click_dataset,
        rank_and_click_dataset_indexed,
    )

    rng = np.random.RandomState(4)
    lengths = [6, 3, 6, 2]
    X = rng.randn(sum(lengths), 5).astype(np.float32)
    y = rng.randint(0, 4, size=sum(lengths)).astype(np.float32)
    qid = np.repeat(np.arange(len(lengths)), lengths)
    ds = SlateDataset(X, y, qid)

    mdef, params = _mlp_model(5)
    fn = as_device_click_fn(OnlyRelevantClickModel(relevancy_threshold=2))
    assert fn is not None
    xs_a, c_a = rank_and_click_dataset(ds, 6, params, mdef, 4, fn)
    xs_b, c_b = rank_and_click_dataset_indexed(ds, 6, params, mdef, 4, fn)
    assert len(xs_a) == len(xs_b)
    for a, b in zip(xs_a, xs_b):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(c_a, c_b):
        np.testing.assert_array_equal(a, b)
