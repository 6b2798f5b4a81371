"""Pod serving beyond the dryrun: the HTTP service in front of the
mesh-sharded scorer on an 8-device mesh, hammered by concurrent clients.

Asserts dynamic-batching correctness under load — every concurrent response
must equal the single-slate reference score computed directly — on both a
pure-DP mesh and a DP x TP mesh (VERDICT round-3 #8; latency histograms from
the real chip live in BENCHMARKS.md via tools/bench_serve_http.py).
"""

import json
import threading
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np
import pytest

from allrank_tpu.config import (FCConfig, ModelConfig, ParallelConfig,
                                PostModelConfig, TransformerConfig)
from allrank_tpu.models.factory import init_params, make_model
from allrank_tpu.parallel import make_mesh
from allrank_tpu.serve_http import SlateScoringService, run_server
from allrank_tpu.serving import make_scorer

F, L = 6, 8


def _model():
    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[8], input_norm=False, activation="ReLU",
                              dropout=None),
            transformer=TransformerConfig(N=1, d_ff=16, h=2,
                                          positional_encoding=None,
                                          dropout=0.0),
            post_model=PostModelConfig(d_output=1),
        ), F,
    )
    return mdef, init_params(jax.random.PRNGKey(0), mdef)


def _require_devices(n: int):
    if jax.device_count() < n:
        pytest.skip(f"needs {n} devices, have {jax.device_count()}")


@pytest.mark.parametrize("parallel", [
    ParallelConfig(data=8),
    ParallelConfig(data=4, model=2),
])
def test_sharded_service_under_concurrent_load(parallel):
    _require_devices(8)
    mesh = make_mesh(parallel)
    mdef, params = _model()
    service = SlateScoringService(params, mdef, L, F, batch_size=8,
                                  max_wait_ms=10, compute_dtype="float32",
                                  mesh=mesh)
    try:
        rng = np.random.RandomState(0)
        slates = [rng.randn(rng.randint(1, L + 1), F).astype(np.float32)
                  for _ in range(64)]
        # hammer from many threads so waves genuinely pack multiple requests
        with ThreadPoolExecutor(max_workers=16) as pool:
            got = list(pool.map(lambda s: service.score(s, timeout=60),
                                slates))

        scorer = make_scorer(params, mdef, "float32")
        for s, g in zip(slates, got):
            xb = np.zeros((1, L, F), dtype=np.float32)
            xb[0, : s.shape[0]] = s
            ref = np.asarray(scorer(xb, np.asarray([s.shape[0]],
                                                   dtype=np.int32)))
            assert g.shape == (s.shape[0],)
            np.testing.assert_allclose(g, ref[0, : s.shape[0]], rtol=1e-4,
                                       atol=1e-5)
    finally:
        service.close()


def test_sharded_service_http_round_trip_under_load():
    _require_devices(8)
    mesh = make_mesh(ParallelConfig(data=8))
    mdef, params = _model()
    service = SlateScoringService(params, mdef, L, F, batch_size=8,
                                  max_wait_ms=5, compute_dtype="float32",
                                  mesh=mesh)
    server = run_server(service, port=0, host="127.0.0.1")
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        rng = np.random.RandomState(1)
        slates = [rng.randn(rng.randint(1, L + 1), F).astype(np.float32)
                  for _ in range(24)]

        def post(slate):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/score",
                data=json.dumps({"slate": slate.tolist()}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return np.asarray(json.loads(r.read())["scores"])

        with ThreadPoolExecutor(max_workers=12) as pool:
            got = list(pool.map(post, slates))

        scorer = make_scorer(params, mdef, "float32")
        for s, g in zip(slates, got):
            xb = np.zeros((1, L, F), dtype=np.float32)
            xb[0, : s.shape[0]] = s
            ref = np.asarray(scorer(xb, np.asarray([s.shape[0]],
                                                   dtype=np.int32)))
            np.testing.assert_allclose(g, ref[0, : s.shape[0]], rtol=1e-4,
                                       atol=1e-5)
    finally:
        server.shutdown()
        service.close()


def test_indivisible_batch_rejected():
    _require_devices(8)
    mesh = make_mesh(ParallelConfig(data=8))
    mdef, params = _model()
    with pytest.raises(ValueError, match="not divisible"):
        SlateScoringService(params, mdef, L, F, batch_size=6, mesh=mesh)


def test_sharded_service_with_batch_buckets():
    """Bucketed waves on the mesh: every bucket must divide the data axis;
    a lone request runs the B=8 program, a burst the B=16 one, and values
    match the direct scorer either way."""
    mdef, params = _model()
    mesh = make_mesh(ParallelConfig(data=8))
    service = SlateScoringService(params, mdef, L, F, batch_size=16,
                                  max_wait_ms=30, compute_dtype="float32",
                                  mesh=mesh, batch_buckets=(8, 16))
    try:
        rng = np.random.RandomState(11)
        slates = [rng.randn(n, F).astype(np.float32)
                  for n in (3, 8, 1, 5, 7, 2, 6, 4, 8, 3, 1, 2)]
        futs = [service.submit(s) for s in slates]
        got = [f.result(timeout=60) for f in futs]
        scorer = make_scorer(params, mdef, "float32")
        for s, g in zip(slates, got):
            xb = np.zeros((1, L, F), dtype=np.float32)
            xb[0, : len(s)] = s
            ref = np.asarray(
                scorer(xb, np.asarray([len(s)], dtype=np.int32)))[0, : len(s)]
            np.testing.assert_allclose(g, ref, rtol=1e-5, atol=1e-5)
    finally:
        service.close()

    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        SlateScoringService(params, mdef, L, F, batch_size=16, mesh=mesh,
                            batch_buckets=(4, 16))
