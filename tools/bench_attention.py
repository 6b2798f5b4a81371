"""Attention path benchmark on hardware: XLA einsum vs fused Pallas kernels.

Times the full gradient chain (forward + backward of a scalar loss) per
(slate length, dtype) at flagship-like shapes, to set the dispatch policy
constants in models/transformer.py (FUSED_ATTENTION_MIN_LEN etc.).

Usage: ``python tools/bench_attention.py [--lengths 240,512,1024]``
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from allrank_tpu.constants import NEG_INF_FILL  # noqa: E402
from tools.bench_util import time_steps  # noqa: E402


def _data(B, h, L, dk, dtype):
    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.randn(B, h, L, dk).astype(np.float32)
    ).astype(dtype)
    mask = jnp.asarray(np.arange(L)[None, :] >= int(L * 0.85)).repeat(B, 0)
    return mk(), mk(), mk(), mask


def _xla_attention(q, k, v, mask):
    dk = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dk)
    s = jnp.where(mask[:, None, None, :], NEG_INF_FILL, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _grad_chain(attn_fn, q, k, v, mask, extra=()):
    def loss(q, k, v):
        return jnp.sum(attn_fn(q, k, v, mask, *extra).astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    def step(state):
        q, k, v = state
        dq, dk_, dv = g(q, k, v)
        return (q, k, v), dq[0, 0, 0, 0]

    return step


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", default="240,512,1024")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--dk", type=int, default=32)
    args = ap.parse_args()

    from allrank_tpu.ops.attention_pallas import fused_slate_attention
    from allrank_tpu.ops.attention_tiled import tiled_slate_attention

    seed = jnp.zeros((), jnp.int32)
    print(f"{'L':>6} {'dtype':>9} {'XLA ms':>8} {'fused ms':>9} "
          f"{'tiled ms':>9}")
    for L in (int(v) for v in args.lengths.split(",")):
        B = args.batch
        if L >= 1024:
            B = max(8, args.batch // 8)  # keep HBM use sane
        for dtype in (jnp.float32, jnp.bfloat16):
            q, k, v, mask = _data(B, args.heads, L, args.dk, dtype)
            rows = []
            for name, fn, extra in (
                ("xla", _xla_attention, ()),
                ("fused", fused_slate_attention, (seed, 0.0)),
                ("tiled", tiled_slate_attention, (seed, 0.0)),
            ):
                try:
                    dt, _ = time_steps(
                        _grad_chain(fn, q, k, v, mask, extra), (q, k, v)
                    )
                    rows.append(dt * 1e3)
                except Exception as e:  # pragma: no cover
                    print(f"  {name} failed at L={L}: {type(e).__name__}",
                          file=sys.stderr)
                    rows.append(float("nan"))
            print(f"{L:>6} {np.dtype(dtype).name:>9} {rows[0]:>8.2f} "
                  f"{rows[1]:>9.2f} {rows[2]:>9.2f}  (B={B})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
