"""K-sweep decomposition of chained-kernel cost (round 4).

The round-3 step budget attributed 0.64 ms/step to a ~35 us/boundary
"chained-launch tax". The round-4 boundary-shift mechanism probe
(tools/exp_boundary_shift.py) contradicted that framing: a pure chain of 8
distinct synthetic kernels ran at ~28 us/kernel — FASTER per call than a
single self-feeding kernel in a scan (76 us) — implying the overhead is
per SCAN ITERATION, not per kernel boundary.

This sweep times scan bodies containing K units for K in {1, 2, 4, 8} and
fits t(K) = intercept + slope*K:
  * intercept  = per-iteration overhead (loop bookkeeping, carry copies,
                 first-kernel warmup)
  * slope      = true marginal per-unit cost in a chain
Arms: a kernel-free XLA body (floor), the synthetic matmul-pair kernel,
the REAL attention+FFN sublayer megakernel pair (fwd, and fwd+bwd as in
training).

Usage: python tools/exp_chain_sweep.py [B] [L]
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench_util import time_steps  # noqa: E402
from exp_boundary_shift import make_calls  # noqa: E402

BF16 = jnp.bfloat16


def measure(step_fn, state, label, repeat=16):
    def scanned(st):
        return jax.lax.scan(lambda c, _: (step_fn(c), None), st,
                            None, length=repeat)[0]

    jitted = jax.jit(scanned)

    def once(st):
        st = jitted(st)
        leaf = jax.tree.leaves(st)[0]
        return st, leaf.reshape(-1)[0].astype(np.float32)

    dt, _ = time_steps(once, state, n1=5, n2=20, repeats=3)
    print(f"{label:<52} {dt / repeat * 1e3:8.3f} ms", flush=True)
    return dt / repeat * 1e3  # ms per scan iteration


def fit(ks, ts, label):
    ks, ts = np.asarray(ks, dtype=float), np.asarray(ts, dtype=float)
    slope, intercept = np.polyfit(ks, ts, 1)
    print(f"{label:<36} slope {slope * 1e3:7.1f} us/unit   "
          f"intercept {intercept * 1e3:7.1f} us/iter")
    return slope, intercept


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    d, d3 = 128, 384
    Ks = [1, 2, 4, 8]
    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(B, L, d) * 0.1, dtype=BF16)

    # ---- floor: kernel-free scan body ------------------------------------
    def xla_unit(xx):
        return (xx.astype(jnp.float32) * 1.0000001).astype(BF16)

    ts = [measure(lambda xx, k=k: _chain(xla_unit, xx, k), x0,
                  f"xla elementwise x{k}") for k in Ks]
    fit(Ks, ts, "XLA elementwise body")

    # ---- synthetic matmul-pair kernel ------------------------------------
    plain, _ = make_calls(B, L, d, d3, 4)
    W1 = [jnp.asarray(rs.randn(d, d3) * 0.05, dtype=BF16) for _ in range(8)]
    W2 = [jnp.asarray(rs.randn(d3, d) * 0.05, dtype=BF16) for _ in range(8)]

    def syn_unit(i):
        return lambda xx: plain(xx, W1[i], W2[i])

    ts = []
    for k in Ks:
        def body(xx, k=k):
            for i in range(k):
                xx = syn_unit(i)(xx)
            return xx
        ts.append(measure(body, x0, f"synthetic kernel x{k}"))
    fit(Ks, ts, "synthetic matmul-pair kernel")

    # ---- real attention+FFN sublayer megakernels -------------------------
    from allrank_tpu.config import TransformerConfig
    from allrank_tpu.models.factory import make_model
    from allrank_tpu.config import FCConfig, ModelConfig, PostModelConfig
    from allrank_tpu.models.factory import init_params
    from allrank_tpu.models.transformer import (_mega_ffn_runner,
                                                _mega_sublayer_runner)

    mdef = make_model(ModelConfig(
        fc_model=FCConfig(sizes=[d], input_norm=False, activation=None,
                          dropout=None),
        transformer=TransformerConfig(N=8, d_ff=512, h=4,
                                      positional_encoding=None,
                                      dropout=0.0),
        post_model=PostModelConfig(d_output=1)), d)
    tdef = mdef.transformer
    params = init_params(jax.random.PRNGKey(0), mdef)
    bparams = jax.tree.map(
        lambda a: a.astype(BF16) if a.dtype == jnp.float32 else a, params)
    layers = bparams["transformer"]["layers"]
    mega = _mega_sublayer_runner(L, B, tdef)
    mega_ffn = _mega_ffn_runner(L, B, tdef)
    assert mega is not None and mega_ffn is not None, "kernel dispatch off"
    mask = jnp.zeros((B, L), dtype=bool)
    seeds = jnp.zeros((2,), dtype=jnp.int32)

    def pair(i, hh):
        hh = mega(layers[i], hh, mask, seeds, 0.0, 0.0)
        return mega_ffn(layers[i], hh, seeds, 0.0, 0.0)

    ts = []
    for k in Ks:
        def body(hh, k=k):
            for i in range(k):
                hh = pair(i, hh)
            return hh
        ts.append(measure(body, x0, f"real attn+ffn pair fwd x{k}"))
    fit(Ks, ts, "real sublayer pair (fwd)")

    # ---- fwd+bwd (as in training) ----------------------------------------
    ts = []
    for k in Ks:
        def body(st, k=k):
            hh, lp = st

            def f(h_in, lps):
                h = h_in
                for i in range(k):
                    h = mega(lps[i], h, mask, seeds, 0.0, 0.0)
                    h = mega_ffn(lps[i], h, seeds, 0.0, 0.0)
                return jnp.sum(h.astype(jnp.float32))

            gh, gp = jax.grad(f, argnums=(0, 1))(hh, lp)
            lp2 = jax.tree.map(
                lambda a, g: a - BF16(1e-6) * g.astype(a.dtype), lp, gp)
            return (hh + BF16(1e-6) * gh, lp2)
        ts.append(measure(body, (x0, layers), f"real pair fwd+bwd x{k}"))
    s, i = fit(Ks, ts, "real sublayer pair (fwd+bwd)")
    print(f"\n4-pair encoder chain cost at the fit: "
          f"{(i + 4 * s):.3f} ms (slope-only {4 * s:.3f} ms)")


def _chain(unit, xx, k):
    for _ in range(k):
        xx = unit(xx)
    return xx


if __name__ == "__main__":
    main()
