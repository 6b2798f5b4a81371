"""Scoring service: dynamic batching correctness + HTTP round trip."""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np

from allrank_tpu.config import FCConfig, ModelConfig, PostModelConfig
from allrank_tpu.models.factory import init_params, make_model
from allrank_tpu.serve_http import SlateScoringService, run_server
from allrank_tpu.serving import make_scorer

F, L = 6, 8


def _model():
    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[8], input_norm=False, activation="ReLU",
                              dropout=None),
            transformer=None,
            post_model=PostModelConfig(d_output=1),
        ), F,
    )
    return mdef, init_params(jax.random.PRNGKey(0), mdef)


def test_batched_scores_match_direct_scorer():
    mdef, params = _model()
    service = SlateScoringService(params, mdef, L, F, batch_size=4,
                                  max_wait_ms=20, compute_dtype="float32")
    try:
        rng = np.random.RandomState(0)
        slates = [rng.randn(n, F).astype(np.float32)
                  for n in (3, 8, 1, 5, 8, 2, 7, 4)]
        # submit concurrently so waves actually pack multiple requests
        futures = [service.submit(s) for s in slates]
        got = [f.result(timeout=30) for f in futures]

        scorer = make_scorer(params, mdef, "float32")
        for s, g in zip(slates, got):
            xb = np.zeros((1, L, F), dtype=np.float32)
            xb[0, : s.shape[0]] = s
            ref = np.asarray(scorer(xb, np.asarray([s.shape[0]],
                                                   dtype=np.int32)))
            np.testing.assert_allclose(g, ref[0, : s.shape[0]], rtol=1e-5,
                                       atol=1e-6)
            assert g.shape == (s.shape[0],)
    finally:
        service.close()


def test_rejects_bad_slates():
    import pytest

    mdef, params = _model()
    service = SlateScoringService(params, mdef, L, F, batch_size=2,
                                  max_wait_ms=1, compute_dtype="float32")
    try:
        with pytest.raises(ValueError, match="exceeds serve length"):
            service.submit(np.zeros((L + 1, F), dtype=np.float32))
        with pytest.raises(ValueError, match="must be"):
            service.submit(np.zeros((3, F + 1), dtype=np.float32))
        with pytest.raises(ValueError, match="empty"):
            service.submit(np.zeros((0, F), dtype=np.float32))
    finally:
        service.close()


def test_http_round_trip():
    mdef, params = _model()
    service = SlateScoringService(params, mdef, L, F, batch_size=4,
                                  max_wait_ms=2, compute_dtype="float32")
    server = run_server(service, port=0, host="127.0.0.1")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["slate_length"] == L

        slate = np.random.RandomState(1).randn(5, F).astype(np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score",
            data=json.dumps({"slate": slate.tolist()}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            scores = json.loads(r.read())["scores"]
        assert len(scores) == 5
        ref = service.score(slate, timeout=30)
        np.testing.assert_allclose(scores, ref, rtol=1e-5, atol=1e-6)

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/score", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=10)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        service.close()


def test_http_binary_npy_round_trip_matches_json():
    """The octet-stream fast path (production payload sizes make JSON
    parsing the end-to-end bottleneck) must score identically to JSON."""
    import io

    mdef, params = _model()
    service = SlateScoringService(params, mdef, L, F, batch_size=4,
                                  max_wait_ms=2, compute_dtype="float32")
    server = run_server(service, port=0, host="127.0.0.1")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        slate = np.random.RandomState(3).randn(6, F).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, slate)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            binary_scores = np.load(io.BytesIO(r.read()),
                                    allow_pickle=False)
        jreq = urllib.request.Request(
            f"http://127.0.0.1:{port}/score",
            data=json.dumps({"slate": slate.tolist()}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(jreq, timeout=30) as r:
            json_scores = np.asarray(json.loads(r.read())["scores"],
                                     dtype=np.float32)
        assert binary_scores.shape == (6,)
        np.testing.assert_allclose(binary_scores, json_scores, rtol=1e-6)

        # malformed binary -> 400, connection alive
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/score", data=b"not an npy",
            headers={"Content-Type": "application/octet-stream"},
        )
        try:
            urllib.request.urlopen(bad, timeout=10)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        service.close()


def test_close_fails_pending_and_rejects_new_submits():
    import pytest

    mdef, params = _model()
    service = SlateScoringService(params, mdef, L, F, batch_size=2,
                                  max_wait_ms=1, compute_dtype="float32")
    service.close()
    with pytest.raises(RuntimeError, match="closed"):
        service.submit(np.zeros((2, F), dtype=np.float32))


def test_http_malformed_body_returns_400_not_dropped_connection():
    mdef, params = _model()
    service = SlateScoringService(params, mdef, L, F, batch_size=2,
                                  max_wait_ms=1, compute_dtype="float32")
    server = run_server(service, port=0, host="127.0.0.1")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        for body in (b"[1,2]", b"not json", b'{"slate": "nope"}'):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/score", data=body,
                headers={"Content-Type": "application/json"},
            )
            try:
                urllib.request.urlopen(req, timeout=10)
                raise AssertionError(f"expected HTTP 400 for {body!r}")
            except urllib.error.HTTPError as e:
                assert e.code == 400, body
    finally:
        server.shutdown()
        service.close()


def test_int8_service_matches_direct_int8_scorer():
    mdef, params = _model()
    service = SlateScoringService(params, mdef, L, F, batch_size=4,
                                  max_wait_ms=20, compute_dtype="int8")
    try:
        rng = np.random.RandomState(5)
        slates = [rng.randn(n, F).astype(np.float32) for n in (3, 8, 1, 5)]
        futures = [service.submit(s) for s in slates]
        got = [f.result(timeout=30) for f in futures]

        # the service runs the quant tower with bf16 elementwise flow (its
        # production default) — compare against the same configuration
        scorer = make_scorer(params, mdef, compute_dtype="bfloat16",
                             quantize="int8")
        for s, g in zip(slates, got):
            xb = np.zeros((1, L, F), dtype=np.float32)
            xb[0, : len(s)] = s
            ref = np.asarray(
                scorer(xb, np.asarray([len(s)], dtype=np.int32)))[0, : len(s)]
            np.testing.assert_allclose(g, ref, rtol=1e-5, atol=1e-5)
    finally:
        service.close()


def test_bucketed_service_routes_waves_to_smallest_bucket():
    mdef, params = _model()
    service = SlateScoringService(params, mdef, L, F, batch_size=4,
                                  max_wait_ms=30, compute_dtype="float32",
                                  batch_buckets=(1, 2, 4))
    used = []
    orig = dict(service._compiled_by_bucket)

    def wrap(b, fn):
        def inner(x, lengths):
            used.append(b)
            return fn(x, lengths)
        return inner

    service._compiled_by_bucket = {b: wrap(b, f) for b, f in orig.items()}
    try:
        rng = np.random.RandomState(7)
        # a lone request -> B=1 bucket
        lone = service.score(rng.randn(5, F).astype(np.float32), timeout=30)
        assert used and used[-1] == 1

        # a concurrent burst of 4 -> B=4 (or a pair of 2s, depending on
        # wave packing) — never more than the wave needs
        slates = [rng.randn(n, F).astype(np.float32) for n in (3, 8, 1, 5)]
        futs = [service.submit(s) for s in slates]
        got = [f.result(timeout=30) for f in futs]

        scorer = make_scorer(params, mdef, "float32")
        for s, g in zip([rng.randn(5, F).astype(np.float32)] * 0 + slates, got):
            xb = np.zeros((1, L, F), dtype=np.float32)
            xb[0, : len(s)] = s
            ref = np.asarray(
                scorer(xb, np.asarray([len(s)], dtype=np.int32)))[0, : len(s)]
            np.testing.assert_allclose(g, ref, rtol=1e-5, atol=1e-5)
        assert len(lone) == 5
    finally:
        service.close()


def test_bucket_validation():
    mdef, params = _model()
    import pytest

    with pytest.raises(ValueError, match="largest bucket"):
        SlateScoringService(params, mdef, L, F, batch_size=4,
                            batch_buckets=(1, 8))


def test_overload_rejection_and_statz():
    import urllib.request as _rq

    from allrank_tpu.serve_http import ServiceOverloaded

    mdef, params = _model()
    service = SlateScoringService(params, mdef, L, F, batch_size=2,
                                  max_wait_ms=200, compute_dtype="float32",
                                  max_queue=2)
    server = run_server(service, 0, host="127.0.0.1")
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    port = server.server_address[1]
    try:
        rng = np.random.RandomState(3)
        # fill the queue faster than the worker drains it (max_wait_ms is
        # long, so the first wave holds the worker while we stuff the queue)
        futs, rejected = [], 0
        for _ in range(24):
            try:
                futs.append(service.submit(
                    rng.randn(3, F).astype(np.float32)))
            except ServiceOverloaded:
                rejected += 1
        assert rejected > 0  # bounded queue actually sheds load
        for f in futs:
            assert len(f.result(timeout=60)) == 3  # admitted ones succeed

        stats = json.loads(_rq.urlopen(
            f"http://127.0.0.1:{port}/statz", timeout=30).read())
        assert stats["requests_total"] == len(futs)
        assert stats["rejected_total"] == rejected
        assert stats["waves_total"] >= 1
        assert sum(stats["waves_by_bucket"].values()) == stats["waves_total"]
        assert "wave_ms" in stats and stats["wave_ms"]["n"] >= 1
    finally:
        server.shutdown()
        service.close()


def test_malformed_binary_body_gets_400_and_zero_max_queue_rejected():
    mdef, params = _model()
    import pytest

    with pytest.raises(ValueError, match="max_queue"):
        SlateScoringService(params, mdef, L, F, batch_size=2, max_queue=0)

    service = SlateScoringService(params, mdef, L, F, batch_size=2,
                                  max_wait_ms=5, compute_dtype="float32")
    server = run_server(service, 0, host="127.0.0.1")
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    port = server.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score", data=b"",
            headers={"Content-Type": "application/octet-stream"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400  # empty npy body -> 400, not a dead socket
    finally:
        server.shutdown()
        service.close()


def test_int8_static_cli_end_to_end(tmp_path):
    """The serve CLI's int8_static path end-to-end as a deployer runs it:
    train-split startup calibration, then serving through a persisted
    act_scales.json (--act-scales) — subprocess, HTTP round trip."""
    import os
    import socket
    import subprocess
    import sys
    import time
    import urllib.request

    from allrank_tpu.data.dummy import write_dummy_dataset
    from allrank_tpu.training.checkpoint import save_params

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    write_dummy_dataset(str(tmp_path / "data"), num_queries=20,
                        results_len=L, num_features=F)
    cfg = {
        "model": {"fc_model": {"sizes": [8], "input_norm": False,
                               "activation": "ReLU", "dropout": None},
                  "transformer": None,
                  "post_model": {"d_output": 1, "output_activation": None}},
        "data": {"path": str(tmp_path / "data"), "num_workers": 0,
                 "batch_size": 4, "slate_length": L,
                 "validation_ds_role": "vali"},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-2}},
        "lr_scheduler": {"name": "StepLR", "args": {"step_size": 5,
                                                    "gamma": 0.5}},
        "training": {"epochs": 1, "gradient_clipping_norm": None,
                     "early_stopping_patience": 0},
        "loss": {"name": "listNet", "args": {}},
        "metrics": ["ndcg_5"], "val_metric": "ndcg_5",
        "expected_metrics": {},
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    mdef, params = _model()
    save_params(params, str(tmp_path / "model.npz"))
    # persisted calibration (what `evaluate --quantize int8_static` writes)
    from allrank_tpu.quant import (calibrate_activations,
                                   calibration_batches_from_dataset)
    from allrank_tpu.data.dataset import load_dataset_role

    ds, _ = load_dataset_role("train", str(tmp_path / "data"), L)
    scales = calibrate_activations(
        params, mdef, calibration_batches_from_dataset(ds, L, 4, 2))
    (tmp_path / "act_scales.json").write_text(json.dumps(scales))

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "from allrank_tpu.serve_http import main; main()",
         "--config-file-name", str(tmp_path / "config.json"),
         "--input-model-path", str(tmp_path / "model.npz"),
         "--n-features", str(F), "--port", str(port),
         "--batch-size", "4", "--compute-dtype", "int8_static",
         "--act-scales", str(tmp_path / "act_scales.json")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=repo)
    try:
        deadline = time.time() + 60
        up = False
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    "server died:\n" + proc.stdout.read().decode())
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=2) as r:
                    up = r.status == 200
                    break
            except OSError:
                time.sleep(0.5)
        assert up, "server never came up"
        slate = np.random.RandomState(3).randn(5, F).tolist()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score",
            data=json.dumps({"slate": slate}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            scores = json.loads(r.read())["scores"]
        assert len(scores) == 5 and all(np.isfinite(scores))
    finally:
        proc.kill()
        proc.wait()
