"""Long-slate lambdaLoss: pair-tiled Pallas kernel vs the XLA chain.

Measures jitted value+grad of the whole lambdaLoss (ndcgLoss2PP, the paper
scheme) at long slate lengths on real TPU hardware — the shapes where the
XLA path materializes multi-GB [B, L, L] intermediates in HBM and the tiled
kernel (ops/lambda_tiled.py) keeps every pair tile in VMEM.

Usage: python tools/bench_lambda_tiled.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import allrank_tpu.losses.lambdaloss as LL
import allrank_tpu.ops.lambda_pallas as LP
import allrank_tpu.ops.lambda_tiled as LT
from tools.bench_util import time_steps


def _data(B, L, seed=0):
    rng = np.random.RandomState(seed)
    y_pred = jnp.asarray(rng.randn(B, L).astype(np.float32))
    y_true = rng.randint(0, 5, size=(B, L)).astype(np.float32)
    # WEB30K-like ragged tails: ~40% of each slate padded on average
    for b in range(B):
        n = rng.randint(L // 3, L + 1)
        y_true[b, n:] = -1.0
    return y_pred, jnp.asarray(y_true)


def bench_case(B, L, path, k=None):
    y_pred, y_true = _data(B, L)

    def loss(p):
        return LL.lambdaLoss(p, y_true, weighing_scheme="ndcgLoss2PP_scheme",
                             mu=10.0, k=k)

    orig = (LP.lambda_pairs_available, LT.tiled_lambda_preferred)
    try:
        if path == "xla":
            LP.lambda_pairs_available = lambda *a: False
            LT.tiled_lambda_preferred = lambda *a: False
        elif path == "tiled":
            LP.lambda_pairs_available = lambda *a: False
            assert LT.tiled_lambda_available(L, B), (
                f"tiled kernel unavailable at B={B} L={L}")
            LT.tiled_lambda_preferred = lambda *a: True
        grad = jax.jit(jax.value_and_grad(loss))

        def step(p):
            v, g = grad(p)
            return p + 0.0 * g, v

        try:
            sec, _ = time_steps(step, y_pred, n1=5, n2=20)
        except Exception as e:  # OOM on the XLA path at large L
            return None, f"{type(e).__name__}"
        return sec, None
    finally:
        LP.lambda_pairs_available, LT.tiled_lambda_preferred = orig


def main():
    print("device:", jax.devices()[0], "backend:", jax.default_backend())
    print("k=None (@max, full pair block):")
    print(f"{'B':>4} {'L':>6} {'XLA ms':>10} {'tiled ms':>10} {'speedup':>8}")
    for B, L in [(64, 512), (64, 1024), (64, 1308), (32, 2048), (16, 4096),
                 (64, 2048), (64, 4096)]:
        xla, xerr = bench_case(B, L, "xla")
        til, terr = bench_case(B, L, "tiled")
        xs = f"{xla * 1e3:10.2f}" if xla else f"{xerr:>10}"
        ts = f"{til * 1e3:10.2f}" if til else f"{terr:>10}"
        sp = f"{xla / til:7.2f}x" if (xla and til) else "      —"
        print(f"{B:>4} {L:>6} {xs} {ts} {sp}")
    print("\nk=10 (ndcg@10 training — top-k slice makes every path O(k^2)):")
    print(f"{'B':>4} {'L':>6} {'default ms':>11}")
    for B, L in [(64, 1308), (64, 4096)]:
        sec, err = bench_case(B, L, "default", k=10)
        print(f"{B:>4} {L:>6} {sec * 1e3:11.3f}" if sec
              else f"{B:>4} {L:>6} {err:>11}")


if __name__ == "__main__":
    main()
