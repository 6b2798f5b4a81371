"""REAL multi-process runs of the evaluate and rank_and_click CLIs.

Mirrors tests/training/test_multiprocess_fit.py for the other two entry
points (reference semantics to preserve at pod scale:
allrank/rank_and_click.py:39-105): a 2-process jax.distributed CPU cluster
(2 devices each -> one 4-device global mesh) drives both CLIs end-to-end.
Asserts:

* evaluate: the sharded global eval reduction equals the single-process
  values; evaluation_result.json is written by the coordinator ONLY.
* rank_and_click: the clicked libsvm and metrics CSVs are written exactly
  once (coordinator), and byte-match the single-process run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
import numpy as np

proc_id = int(sys.argv[1])
n_procs = int(sys.argv[2])
coord = sys.argv[3]
work = sys.argv[4]  # shared dir: data/, config.json, model.npz
devices_per_proc = 4 // n_procs

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={devices_per_proc}"
)
import jax
jax.config.update("jax_platforms", "cpu")
if n_procs > 1:
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n_procs, process_id=proc_id)
assert jax.device_count() == 4

from argparse import Namespace

from allrank_tpu import evaluate, rank_and_click

# each process gets its OWN job dir -> proves non-coordinators write nothing
job = os.path.join(work, f"job_p{proc_id}_of_{n_procs}")

eval_args = Namespace(
    job_dir=os.path.join(job, "eval"), run_id="e1",
    config_file_name=os.path.join(work, "config.json"),
    input_model_path=os.path.join(work, "model.npz"),
    roles=["train", "vali"],
)
eval_results = evaluate.run(eval_args)

click_args = Namespace(
    job_dir=os.path.join(job, "click"), run_id="c1",
    config_file_name=os.path.join(work, "config.json"),
    input_model_path=os.path.join(work, "model.npz"),
    roles=["vali"],
)
click_summaries = rank_and_click.run(click_args)

flat_eval = {f"{r}/{k}": v for r, m in eval_results.items() for k, v in m.items()}
print("EVALJSON " + json.dumps(flat_eval, sort_keys=True))
print("CLICKJSON " + json.dumps(click_summaries, sort_keys=True))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _prepare_shared(work):
    """Dummy data + a small trained-enough checkpoint + config (click model
    included), written once and shared by every process."""
    work.mkdir(exist_ok=True)
    from allrank_tpu.config import Config
    from allrank_tpu.data.dummy import write_dummy_dataset
    from allrank_tpu.models.factory import init_params, make_model
    from allrank_tpu.training.checkpoint import save_params

    write_dummy_dataset(str(work / "data"), num_queries=26, results_len=8,
                        num_features=10)
    cfg = {
        "model": {
            "fc_model": {"sizes": [12], "input_norm": False,
                         "activation": "ReLU", "dropout": None},
            "transformer": None,
            "post_model": {"d_output": 1, "output_activation": None},
        },
        # binary_cache on: both cluster processes race to write the .npy
        # sidecars on the shared filesystem — atomic-replace publication
        # must keep every process's loads correct (multi-writer safety)
        "data": {"path": str(work / "data"), "num_workers": 0,
                 "batch_size": 4, "slate_length": 8,
                 "validation_ds_role": "vali", "binary_cache": True},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-2}},
        "lr_scheduler": {"name": "StepLR", "args": {"step_size": 10,
                                                    "gamma": 0.1}},
        "training": {"epochs": 1, "gradient_clipping_norm": None,
                     "early_stopping_patience": 0},
        "loss": {"name": "listNet", "args": {}},
        "metrics": ["ndcg_5", "mrr_5"],
        "val_metric": "ndcg_5",
        "expected_metrics": {},
        "click_model": {
            "name": "allrank_tpu.click_models.base.FixedClickModel",
            "args": {"click_positions": [0, 1]},
        },
    }
    (work / "config.json").write_text(json.dumps(cfg))

    import jax

    config = Config.from_json(str(work / "config.json"))
    mdef = make_model(config.model, 10)
    save_params(init_params(jax.random.PRNGKey(7), mdef),
                str(work / "model.npz"))


def _run_cluster(n_procs, tmp_path, work):
    worker = tmp_path / f"worker_{n_procs}.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(n_procs), coord,
             str(work)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=_REPO_ROOT,
        )
        for i in range(n_procs)
    ]
    payloads = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        text = out.decode()
        assert p.returncode == 0, f"proc {i}/{n_procs} failed:\n{text}"
        payload = {}
        for ln in text.splitlines():
            if ln.startswith("EVALJSON "):
                payload["eval"] = json.loads(ln[len("EVALJSON "):])
            elif ln.startswith("CLICKJSON "):
                payload["click"] = json.loads(ln[len("CLICKJSON "):])
        assert payload.get("eval") and payload.get("click"), text
        payloads.append(payload)
    return payloads


def _assert_close_dicts(a, b, tol=1e-6):
    assert a.keys() == b.keys(), (sorted(a), sorted(b))
    for k in a:
        av, bv = a[k], b[k]
        if isinstance(av, dict):
            _assert_close_dicts(av, bv, tol)
        else:
            assert abs(av - bv) <= tol * max(1.0, abs(av)), (k, av, bv)


def test_evaluate_and_rank_and_click_on_a_two_process_cluster(tmp_path):
    work = tmp_path / "shared"
    _prepare_shared(work)

    single = _run_cluster(1, tmp_path, work)
    double = _run_cluster(2, tmp_path, work)

    # both cluster processes observe identical global results
    assert double[0]["eval"] == double[1]["eval"]
    assert double[0]["click"] == double[1]["click"]
    # the sharded reduction matches the single-process values
    _assert_close_dicts(double[0]["eval"], single[0]["eval"])
    _assert_close_dicts(double[0]["click"], single[0]["click"])

    def outdir(n, proc, kind, run_id):
        return (work / f"job_p{proc}_of_{n}" / kind / "results" / run_id)

    # coordinator wrote the artifacts...
    eval_json_1 = outdir(1, 0, "eval", "e1") / "evaluation_result.json"
    eval_json_2 = outdir(2, 0, "eval", "e1") / "evaluation_result.json"
    assert eval_json_1.exists() and eval_json_2.exists()
    _assert_close_dicts(json.loads(eval_json_1.read_text()),
                        json.loads(eval_json_2.read_text()))

    clicked_1 = outdir(1, 0, "click", "c1")
    clicked_2 = outdir(2, 0, "click", "c1")
    for name in ("vali.txt", "vali_metrics.csv", "vali_metrics_mean.csv"):
        f1, f2 = clicked_1 / name, clicked_2 / name
        assert f1.exists() and f2.exists(), name
        assert f1.read_bytes() == f2.read_bytes(), (
            f"{name} differs between single- and two-process runs"
        )

    # ...and the non-coordinator wrote NONE (its job dir has no results)
    assert not (outdir(2, 1, "eval", "e1") / "evaluation_result.json").exists()
    for name in ("vali.txt", "vali_metrics.csv", "vali_metrics_mean.csv"):
        assert not (outdir(2, 1, "click", "c1") / name).exists(), name


def test_evaluate_single_process_unchanged(tmp_path):
    """The pod-path refactor keeps single-process evaluate results identical
    to the training-eval convention (guard for the mesh/global-batch move)."""
    work = tmp_path / "shared"
    _prepare_shared(work)
    from argparse import Namespace

    from allrank_tpu import evaluate

    res = evaluate.run(Namespace(
        job_dir=str(tmp_path / "eval_sp"), run_id="e1",
        config_file_name=str(work / "config.json"),
        input_model_path=str(work / "model.npz"),
        roles=["vali"],
    ))
    assert set(res) == {"vali"}
    assert {"ndcg_5", "mrr_5", "loss"} <= set(res["vali"])
    assert all(np.isfinite(v) for v in res["vali"].values())
