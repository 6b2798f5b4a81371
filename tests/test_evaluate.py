"""Offline evaluation CLI: train -> evaluate checkpoint -> values match the
training run's validation metrics; the expected_metrics gate works offline."""

import json
import os
from argparse import Namespace

import pytest

from allrank_tpu.data.dummy import write_dummy_dataset


def _config(data_path, expected=None):
    return {
        "model": {
            "fc_model": {"sizes": [24], "input_norm": False,
                         "activation": None, "dropout": None},
            "transformer": {"N": 1, "d_ff": 32, "h": 2,
                            "positional_encoding": None, "dropout": 0.0},
            "post_model": {"d_output": 4, "output_activation": "Sigmoid"},
        },
        "data": {"path": data_path, "num_workers": 0, "batch_size": 16,
                 "slate_length": 12, "validation_ds_role": "vali"},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-2}},
        "lr_scheduler": {"name": "StepLR",
                         "args": {"step_size": 10, "gamma": 0.1}},
        "training": {"epochs": 3, "gradient_clipping_norm": None,
                     "early_stopping_patience": 0},
        "loss": {"name": "ordinal", "args": {"n": 4}},
        "metrics": ["ndcg_5", "mrr_5", "map_5"],
        "val_metric": "ndcg_5",
        "expected_metrics": expected or {},
    }


def test_evaluate_matches_training_val_metrics(tmp_path):
    from allrank_tpu.evaluate import run as evaluate
    from allrank_tpu.main import run as train

    data_dir = str(tmp_path / "data")
    write_dummy_dataset(data_dir, num_queries=64, results_len=12,
                        num_features=16)
    cfg_path = str(tmp_path / "config.json")
    json.dump(_config(data_dir), open(cfg_path, "w"))

    job = str(tmp_path / "job")
    trained = train(Namespace(job_dir=job, run_id="t",
                              config_file_name=cfg_path))
    model = os.path.join(job, "results", "t", "model.npz")

    results = evaluate(Namespace(job_dir=job, run_id="e",
                                 config_file_name=cfg_path,
                                 input_model_path=model,
                                 roles=["vali", "train"]))
    assert set(results) == {"vali", "train"}
    # evaluating the final checkpoint on vali must reproduce the training
    # run's final val metrics (same eval step, same shapes)
    for k, v in trained["val_metrics"].items():
        assert results["vali"][k] == pytest.approx(v, abs=1e-6), k
    assert "loss" in results["vali"]
    assert "map_5" in results["vali"]

    out = os.path.join(job, "results", "e", "evaluation_result.json")
    flat = json.load(open(out))
    assert flat["vali/ndcg_5"] == pytest.approx(
        results["vali"]["ndcg_5"], abs=1e-9)
    assert "train/ndcg_5" in flat

    # device_cache path: index-mode feed + HBM table, same numbers exactly
    cached_cfg = _config(data_dir)
    cached_cfg["data"]["device_cache"] = True
    cfg2 = str(tmp_path / "cached.json")
    json.dump(cached_cfg, open(cfg2, "w"))
    cached = evaluate(Namespace(job_dir=job, run_id="e2",
                                config_file_name=cfg2,
                                input_model_path=model, roles=["vali"]))
    for k, v in results["vali"].items():
        assert cached["vali"][k] == pytest.approx(v, abs=1e-6), k


def test_evaluate_gate_fails_on_unmet_expectation(tmp_path):
    from allrank_tpu.evaluate import run as evaluate
    from allrank_tpu.main import run as train

    data_dir = str(tmp_path / "data")
    write_dummy_dataset(data_dir, num_queries=48, results_len=10,
                        num_features=12)
    cfg_path = str(tmp_path / "config.json")
    json.dump(_config(data_dir), open(cfg_path, "w"))
    job = str(tmp_path / "job")
    train(Namespace(job_dir=job, run_id="t", config_file_name=cfg_path))
    model = os.path.join(job, "results", "t", "model.npz")

    gated = str(tmp_path / "gated.json")
    json.dump(_config(data_dir, expected={"val": {"ndcg_5": 1.01}}),  # "val" aliases validation_ds_role
              open(gated, "w"))
    with pytest.raises(AssertionError, match="expected to be at least"):
        evaluate(Namespace(job_dir=job, run_id="g", config_file_name=gated,
                           input_model_path=model, roles=["vali"]))


def test_evaluate_int8_quantized_tracks_fp32(tmp_path):
    """--quantize int8: the offline quality-delta check a production user
    runs before enabling int8 serving. The quantized eval must run the full
    CLI path and land within 2% relative on every ranking metric."""
    from allrank_tpu.evaluate import run as evaluate
    from allrank_tpu.main import run as train

    data_dir = str(tmp_path / "data")
    write_dummy_dataset(data_dir, num_queries=48, results_len=12,
                        num_features=16)
    cfg_path = str(tmp_path / "config.json")
    json.dump(_config(data_dir), open(cfg_path, "w"))

    job = str(tmp_path / "job")
    train(Namespace(job_dir=job, run_id="t", config_file_name=cfg_path))
    model = os.path.join(job, "results", "t", "model.npz")

    fp32 = evaluate(Namespace(job_dir=job, run_id="e32",
                              config_file_name=cfg_path,
                              input_model_path=model, roles=["vali"]))
    int8 = evaluate(Namespace(job_dir=job, run_id="e8",
                              config_file_name=cfg_path,
                              input_model_path=model, roles=["vali"],
                              quantize="int8"))
    for k in ("ndcg_5", "mrr_5", "map_5"):
        assert int8["vali"][k] == pytest.approx(fp32["vali"][k], rel=0.02), k
    out = os.path.join(job, "results", "e8", "evaluation_result.json")
    assert "vali/ndcg_5" in json.load(open(out))

    # int8_static: calibrates on the train role, writes act_scales.json,
    # and must land within the same 2% band (the production serving mode)
    st = evaluate(Namespace(job_dir=job, run_id="e8s",
                            config_file_name=cfg_path,
                            input_model_path=model, roles=["vali"],
                            quantize="int8_static",
                            calibration_role="train",
                            calibration_batches=4))
    for k in ("ndcg_5", "mrr_5", "map_5"):
        assert st["vali"][k] == pytest.approx(fp32["vali"][k], rel=0.02), k
    scales = json.load(open(os.path.join(job, "results", "e8s",
                                         "act_scales.json")))
    assert scales
    for vec in scales.values():  # per-input-channel absmax vectors
        assert all(v > 0 for v in vec)
