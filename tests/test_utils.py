"""Utils coverage: paths, experiment dump/gate, reflection, writers."""

import json
import os

import numpy as np
import pytest

from allrank_tpu.config import NameArgsConfig
from allrank_tpu.utils.command_executor import execute_command
from allrank_tpu.utils.experiments import (
    assert_expected_metrics,
    dump_experiment_result,
    flatten,
)
from allrank_tpu.utils.file_utils import (
    PathsContainer,
    create_output_dirs,
    get_path_from_local_uri,
    is_gs_path,
)
from allrank_tpu.utils.python_utils import (
    all_equal,
    dummy_context_mgr,
    instantiate_class,
    instantiate_from_recursive_name_args,
)
from allrank_tpu.utils.tensorboard_utils import TensorboardSummaryWriter


def test_paths_container_layout(tmp_path):
    paths = PathsContainer.from_args(str(tmp_path), "run7", "cfg.json")
    assert paths.output_dir == str(tmp_path / "results" / "run7")
    assert paths.tensorboard_output_path == str(
        tmp_path / "tb_evals" / "single" / "run7")
    create_output_dirs(paths.output_dir)
    for sub in ("models", "evals", "predictions"):
        assert os.path.isdir(os.path.join(paths.output_dir, sub))


def test_uri_helpers():
    assert is_gs_path("gs://bucket/x") and not is_gs_path("/local/x")
    assert get_path_from_local_uri("file://host/p") == "host/p"
    assert get_path_from_local_uri("/plain") == "/plain"


def test_flatten_and_dump_and_gate(tmp_path):
    assert flatten({"a": {"b": 1}, "c": 2}) == {"a/b": 1, "c": 2}
    result = {"val_metrics": {"ndcg_5": np.float32(0.8)},
              "train_metrics": {"ndcg_5": 0.9}}
    path = dump_experiment_result("r", {"k": {"n": 1}}, str(tmp_path), result)
    dumped = json.load(open(path))
    assert dumped["val_metrics/ndcg_5"] == pytest.approx(0.8)
    assert dumped["run_id"] == "r"

    assert_expected_metrics(result, {"val": {"ndcg_5": 0.7}})  # passes
    with pytest.raises(AssertionError):
        assert_expected_metrics(result, {"val": {"ndcg_5": 0.85}})
    assert_expected_metrics(result, {})  # empty gate is a no-op


def test_reflection_instantiation_nested():
    cm = instantiate_from_recursive_name_args(NameArgsConfig(
        name="allrank_tpu.click_models.cascade_models.DiverseClicksModel",
        args={"inner_click_model": {
            "name": "allrank.click_models.cascade_models.BaseCascadeModel",
            "args": {"eta": 1.0, "threshold": 2}},
            "q_percentile": 0.25},
    ))
    assert cm.q_percentile == 0.25
    assert cm.inner_click_model.eta == 1.0  # allrank. prefix remapped

    with pytest.raises((ImportError, AttributeError, ModuleNotFoundError)):
        instantiate_class("no.such.Thing")


def test_python_utils_small():
    assert all_equal([1, 1, 1]) and not all_equal([1, 2])
    with dummy_context_mgr() as x:
        assert x is None


def test_command_executor_raises_on_failure():
    execute_command("true")
    with pytest.raises(RuntimeError):
        execute_command("false")


def test_tensorboard_writer_fallback(tmp_path):
    w = TensorboardSummaryWriter(str(tmp_path))
    w.save_to_tensorboard({("train", "loss"): 1.5, ("val", "ndcg_5"): 0.7}, 0)
    w.save_to_tensorboard({("train", "loss"): 1.2, ("val", "ndcg_5"): 0.8}, 1)
    w.close_all_writers()
    # one writer dir per role (reference: one SummaryWriter per metric_role)
    roles = sorted(os.listdir(tmp_path))
    assert any("train" in r for r in roles) and any("val" in r for r in roles)
