"""HTTP serving latency under concurrent load (records the histogram for
BENCHMARKS.md).

Runs SlateScoringService (optionally mesh-sharded) behind the threaded HTTP
server on the local device(s), fires N concurrent clients at it, and prints
a JSON report: throughput + end-to-end latency percentiles (the dynamic
batcher's wait is part of the number — that is the production trade).

    python tools/bench_serve_http.py [--requests 2000] [--clients 32]
    [--batch 64] [--wait-ms 5] [--mesh]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--requests", type=int, default=2000)
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--wait-ms", type=float, default=5.0)
    p.add_argument("--slate-length", type=int, default=240)
    p.add_argument("--features", type=int, default=136)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--mesh", action="store_true",
                   help="serve through make_sharded_scorer over the full mesh")
    p.add_argument("--binary", action="store_true",
                   help="npy octet-stream bodies instead of JSON")
    p.add_argument("--batch-buckets", default=None,
                   help="comma-separated wave buckets, e.g. 1,8,64")
    p.add_argument("--max-queue", type=int, default=None,
                   help="bounded pending queue (overflow -> 503 load-shed)")
    args = p.parse_args()

    import jax

    from allrank_tpu.config import (FCConfig, ModelConfig, ParallelConfig,
                                    PostModelConfig, TransformerConfig)
    from allrank_tpu.models.factory import init_params, make_model
    from allrank_tpu.parallel import make_mesh
    from allrank_tpu.serve_http import SlateScoringService, run_server

    # the paper tower at WEB30K shape
    mdef = make_model(ModelConfig(
        fc_model=FCConfig(sizes=[96, 64], input_norm=True,
                          activation="ReLU", dropout=None),
        transformer=TransformerConfig(N=2, d_ff=256, h=2,
                                      positional_encoding=None, dropout=0.0),
        post_model=PostModelConfig(d_output=1)), args.features)
    params = init_params(jax.random.PRNGKey(0), mdef)

    mesh = make_mesh(ParallelConfig(data=-1)) if args.mesh else None
    service = SlateScoringService(
        params, mdef, args.slate_length, args.features,
        batch_size=args.batch, max_wait_ms=args.wait_ms,
        compute_dtype=args.dtype, mesh=mesh,
        batch_buckets=([int(b) for b in args.batch_buckets.split(",")]
                       if args.batch_buckets else None),
        max_queue=args.max_queue,
    )
    server = run_server(service, port=0, host="127.0.0.1")
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    rng = np.random.RandomState(0)
    if args.binary:
        import io

        def body_of(slate):
            out = io.BytesIO()
            np.save(out, np.asarray(slate, dtype=np.float32))
            return out.getvalue()

        ctype = "application/octet-stream"
    else:
        def body_of(slate):
            return json.dumps({"slate": slate.tolist()}).encode()

        ctype = "application/json"
    bodies = [
        body_of(rng.randn(int(rng.randint(10, args.slate_length + 1)),
                          args.features))
        for _ in range(min(64, args.requests))
    ]

    shed = [0]

    def post(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score", data=bodies[i % len(bodies)],
            headers={"Content-Type": ctype})
        t0 = time.perf_counter()
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                r.read()
        except urllib.error.HTTPError as exc:
            if exc.code == 503:  # admission load-shed under --max-queue
                shed[0] += 1
                return np.nan
            raise
        return (time.perf_counter() - t0) * 1e3

    # warmup wave
    with ThreadPoolExecutor(max_workers=args.clients) as pool:
        list(pool.map(post, range(args.clients)))

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.clients) as pool:
        lat = list(pool.map(post, range(args.requests)))
    wall = time.perf_counter() - t0

    lat = np.asarray(lat)
    lat = lat[np.isfinite(lat)]
    stats = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/statz", timeout=30).read())
    report = {
        "shed_503": shed[0],
        "statz": {k: stats[k] for k in
                  ("waves_total", "waves_by_bucket", "rejected_total")
                  if k in stats},
        "requests": args.requests,
        "clients": args.clients,
        "batch_size": args.batch,
        "max_wait_ms": args.wait_ms,
        "slate_length": args.slate_length,
        "mesh": dict(mesh.shape) if mesh is not None else None,
        "payload": "npy" if args.binary else "json",
        "throughput_slates_per_s": round(args.requests / wall, 1),
    }
    if lat.size:
        report["latency_ms"] = {
            "p50": round(float(np.percentile(lat, 50)), 2),
            "p90": round(float(np.percentile(lat, 90)), 2),
            "p99": round(float(np.percentile(lat, 99)), 2),
            "max": round(float(lat.max()), 2),
        }
        report["histogram_ms"] = {
            f"<{edge}": int((lat < edge).sum())
            for edge in (2, 5, 10, 20, 50, 100, 250, 1000)
        }
    else:
        # total overload: every request was shed with 503 — that IS the
        # --max-queue benchmark result, not a crash
        report["latency_ms"] = None
        report["note"] = "all requests load-shed (503); no latency sample"
    print(json.dumps(report))
    server.shutdown()
    service.close()


if __name__ == "__main__":
    main()
