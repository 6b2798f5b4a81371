"""Decompose the attention sublayer megakernel's time (round 4).

With the chained-launch tax retired (BENCHMARKS.md), the remaining named
headroom sits INSIDE the attention kernel (~73% of its padding-adjusted
bound). This experiment splits the forward kernel's time across its
stages with variant kernels (identical structure, one stage neutered at a
time — wrong math, honest timing), and times the production forward and
backward pallas calls directly. All arms are K-sweeps (slope = true
in-situ cost; tools/exp_chain_sweep.py methodology).

Variants (fwd, no dropout):
  * full        — the production math
  * no_softmax  — probs = masked scores (removes max/exp/sum/div VPU work)
  * no_scores   — skips the QK^T contraction (probs = constant)
  * no_pv       — skips the P@V contraction (ctx = v)
  * frame       — LN + QKV + out-proj only (no attention core at all)

Usage: python tools/exp_attn_decompose.py [B] [L]
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from allrank_tpu.constants import NEG_INF_FILL  # noqa: E402
from allrank_tpu.ops.attention_block import (  # noqa: E402
    _batch_block,
    _common_specs,
    _dot,
    _dot_qk,
    _layer_norm,
    _mm,
    _param_inputs,
)
from exp_chain_sweep import fit, measure  # noqa: E402

F32 = jnp.float32
BF16 = jnp.bfloat16


def _variant_fwd_vmem(x, padded, gvec, bvec, wqkv, bqkv, wout, bout, *,
                      h, dk, mode):
    d = h * dk
    dtype = x.dtype
    x32 = x.astype(F32)
    n_act, _, _, _, _ = _layer_norm(x32, gvec, bvec, d)
    n_act = n_act.astype(dtype)
    qkv = (_mm(n_act, wqkv.astype(dtype)) + bqkv.astype(F32)).astype(dtype)
    if mode == "frame":
        # keep QKV live (DCE-proof) but no attention core
        ctx = (qkv[:, :, :d] + qkv[:, :, d:2 * d] + qkv[:, :, 2 * d:])
    else:
        scale = 1.0 / (dk ** 0.5)
        parts = []
        for i in range(h):
            q = qkv[:, :, i * dk:(i + 1) * dk]
            k = qkv[:, :, d + i * dk:d + (i + 1) * dk]
            v = qkv[:, :, 2 * d + i * dk:2 * d + (i + 1) * dk]
            sc = _dot_qk(q, k) * scale
            sc = jnp.where(padded[:, None, :] > 0.5, NEG_INF_FILL, sc)
            if mode == "no_softmax":
                p = sc * 0.001
            elif mode == "exp2":
                # exp(x) == exp2(x * log2 e); one A/B candidate if jnp.exp
                # lowers to a costlier chain than native exp2
                m = jnp.max(sc, axis=-1, keepdims=True)
                e = jnp.exp2((sc - m) * 1.4426950408889634)
                p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
            elif mode == "norm_after_pv":
                # normalize AFTER the P@V contraction: saves the full
                # [L, L] elementwise p = e * inv_sum pass; the row scale
                # applies to the [L, dk] context instead
                m = jnp.max(sc, axis=-1, keepdims=True)
                e = jnp.exp(sc - m)
                inv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
                ctx_h = _dot(e.astype(dtype), v.astype(dtype))
                parts.append((ctx_h * inv).astype(dtype))
                continue
            else:
                m = jnp.max(sc, axis=-1, keepdims=True)
                e = jnp.exp(sc - m)
                p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
            if mode == "no_pv":
                # v plus a thin live slice of p (DCE-proof, ~no cost)
                parts.append(v + p[:, :, :dk].astype(dtype) * 0.001)
            else:
                parts.append(_dot(p.astype(dtype), v.astype(dtype)))
        ctx = jnp.concatenate(parts, axis=-1).astype(dtype)
    a = _mm(ctx, wout.astype(dtype)) + bout.astype(F32)
    return (x32 + a).astype(dtype)


def _variant_kernel(seeds_ref, x_ref, mask_ref, g_ref, b_ref, wqkv_ref,
                    bqkv_ref, wout_ref, bout_ref, y_ref, *, h, dk, mode):
    del seeds_ref
    y_ref[...] = _variant_fwd_vmem(
        x_ref[...], mask_ref[:, 0], g_ref[0], b_ref[0], wqkv_ref[...],
        bqkv_ref[0], wout_ref[...], bout_ref[0], h=h, dk=dk, mode=mode)


def make_variant(b, l, d, h, mode):
    dk = d // h
    bb = _batch_block(b, l)
    blk, mask, vec, mat = _common_specs(l, d, bb)
    kernel = functools.partial(_variant_kernel, h=h, dk=dk, mode=mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[blk, mask, vec(d), vec(d), mat(d, 3 * d), vec(3 * d),
                  mat(d, d), vec(d)],
        out_specs=blk,
    )
    call = pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct((b, l, d), BF16))

    def run(x, key_mask, params):
        return call(jnp.zeros(2, jnp.int32), x,
                    key_mask.astype(F32)[:, None, :],
                    *_param_inputs(*params))

    return run


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    d, h = 128, 4
    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(B, L, d) * 0.1, dtype=BF16)
    key_mask = jnp.zeros((B, L), dtype=bool)

    def mk_params(i):
        r = np.random.RandomState(100 + i)
        return (jnp.ones(d, F32), jnp.zeros(d, F32),
                jnp.asarray(r.randn(d, 3 * d) * 0.05, BF16),
                jnp.zeros(3 * d, F32),
                jnp.asarray(r.randn(d, d) * 0.05, BF16), jnp.zeros(d, F32))

    plist = [mk_params(i) for i in range(8)]
    Ks = [2, 4, 8]

    # interleaved rounds: the tunnel drifts +-30% over minutes, so each
    # round measures every arm back-to-back and the per-arm minimum over
    # rounds is compared (pure K=8 chains; slope fitting needs too many
    # samples to interleave)
    modes = ("full", "no_softmax", "exp2", "norm_after_pv", "no_pv", "frame")
    runs = {m: make_variant(B, L, d, h, m) for m in modes}
    K = 8
    results = {m: float("inf") for m in modes}
    for rnd in range(3):
        for m in modes:
            def body(xx, m=m):
                for i in range(K):
                    xx = runs[m](xx, key_mask, plist[i])
                return xx
            t = measure(body, x0, f"[round {rnd}] attn fwd [{m}] x{K}")
            results[m] = min(results[m], t / K * 1e3)

    print("\nper-kernel cost (us, min over interleaved rounds, K=8 chains):")
    for m in modes:
        print(f"  {m:<14} {results[m]:7.1f}")
    softmax_us = results['full'] - results['no_softmax']
    print(f"\n  softmax total:        {softmax_us:7.1f}")
    print(f"  exp2 saves:           {results['full'] - results['exp2']:7.1f}")
    print(f"  norm-after-PV saves:  "
          f"{results['full'] - results['norm_after_pv']:7.1f}")
    print(f"  P@V contraction:      {results['full'] - results['no_pv']:7.1f}")
    print(f"  LN+QKV+out frame:     {results['frame']:7.1f}")

    # production fwd and bwd pallas calls, timed directly (K-sweep)
    from allrank_tpu.ops.attention_block import _fwd_call, _sub_bwd

    seeds = jnp.zeros(2, jnp.int32)
    ts = []
    for k in Ks:
        def body(xx, k=k):
            for i in range(k):
                xx = _fwd_call(xx, key_mask, *plist[i], seeds, h, 0.0, 0.0)
            return xx
        ts.append(measure(body, x0, f"production fwd x{k}"))
    fit(Ks, ts, "production fwd call")

    ts = []
    for k in Ks:
        def body(st, k=k):
            xx, dy = st
            for i in range(k):
                residuals = (xx, key_mask) + plist[i] + (seeds,)
                outs = _sub_bwd(h, 0.0, 0.0, residuals, dy)
                dy = outs[0]
            return (xx, dy)
        ts.append(measure(body, (x0, x0), f"production bwd x{k}"))
    fit(Ks, ts, "production bwd call")


if __name__ == "__main__":
    main()
