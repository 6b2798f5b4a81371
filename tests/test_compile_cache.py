"""The persistent XLA compilation cache seam (main._setup_compilation_cache).

Cold compiles on remote-compile runtimes cost minutes (BENCHMARKS.md measured
498 s for the flagship scan-step program); the mitigation is the persistent
cache wired by default in the train CLI. This test proves the seam actually
works ACROSS PROCESS RESTARTS: two subprocess runs of the real train CLI with
``ALLRANK_TPU_CACHE_DIR`` pointed at a fresh directory — the first must
populate the cache with jitted-program entries, the second must run entirely
from it (no new cache artifacts written) and produce the same artifacts.

No reference analog (the reference re-traces torch eagerly every run).
"""

import json
import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")  # the axon plugin ignores the env var
from argparse import Namespace
from allrank_tpu.main import run
run(Namespace(job_dir=sys.argv[1], run_id=sys.argv[2], config_file_name=sys.argv[3]))
"""


def _tiny_config(data_path: str) -> dict:
    return {
        "model": {
            "fc_model": {"sizes": [8], "input_norm": False, "activation": None,
                         "dropout": None},
            "transformer": None,
            "post_model": {"d_output": 1, "output_activation": None},
        },
        "data": {"path": data_path, "num_workers": 0, "batch_size": 8,
                 "slate_length": 6, "validation_ds_role": "vali"},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-2}},
        "lr_scheduler": {"name": "StepLR", "args": {"step_size": 10, "gamma": 0.1}},
        "training": {"epochs": 1, "gradient_clipping_norm": None,
                     "early_stopping_patience": 0},
        "loss": {"name": "pointwise_rmse", "args": {"no_of_levels": 4}},
        "metrics": ["ndcg_5"],
        "val_metric": "ndcg_5",
        "expected_metrics": {},
    }


def _cache_entries(cache_dir) -> set:
    return {f for f in os.listdir(cache_dir)} if os.path.isdir(cache_dir) else set()


def test_second_process_runs_from_the_persistent_cache(tmp_path):
    from allrank_tpu.data.dummy import write_dummy_dataset

    data_dir = tmp_path / "data"
    write_dummy_dataset(str(data_dir), num_queries=24, results_len=8,
                        num_features=12)

    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(_tiny_config(str(data_dir))))
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)
    cache_dir = tmp_path / "xla_cache"

    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["ALLRANK_TPU_CACHE_DIR"] = str(cache_dir)
    env["ALLRANK_TPU_CACHE_MIN_COMPILE_SECS"] = "0"

    def _run(run_id: str) -> str:
        proc = subprocess.run(
            [sys.executable, str(driver), str(tmp_path / "job"), run_id,
             str(cfg_path)],
            capture_output=True, text=True, env=env, cwd=_REPO_ROOT,
            timeout=420,
        )
        assert proc.returncode == 0, proc.stdout + proc.stderr
        result = tmp_path / "job" / "results" / run_id / "experiment_result.json"
        assert result.exists(), "train CLI produced no experiment_result.json"
        return result.read_text()

    _run("cold")
    after_cold = _cache_entries(cache_dir)
    assert after_cold, "first run persisted no compilation-cache entries"
    assert any(e.startswith("jit_") for e in after_cold), sorted(after_cold)[:5]

    _run("warm")
    after_warm = _cache_entries(cache_dir)
    new_entries = after_warm - after_cold
    assert not new_entries, (
        "second process recompiled programs the cache should have served: "
        f"{sorted(new_entries)[:10]}"
    )
