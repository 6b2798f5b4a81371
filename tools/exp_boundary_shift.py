"""Mechanism test for the cross-block boundary shift (round-4, VERDICT #5a).

Hypothesis under test: the measured ~35 us/boundary chained-launch tax
(BENCHMARKS.md round-3 step budget) shrinks if every kernel boundary
carries MXU work instead of a bare residual round-trip — i.e. fold block
i+1's LN+QKV matmul into block i's kernel so the consumer starts on
ready operands ("boundary shift").

Rather than building (and backward-deriving) full shifted sublayer
megakernels first, this experiment isolates the MECHANISM with two
synthetic kernel chains of identical total FLOPs at the flagship shape
(bf16, B=64, L=240, d=128, 3d=384 — QKV-like matmul pair per kernel):

  * PLAIN:   k_i(x) = x + relu(LN(x) @ W1_i) @ W2_i          (bare-residual
             boundary — the production layout)
  * SHIFTED: k_i(x, pre) = (out, LN(out) @ W1_{i+1}) with
             out = x + relu(pre) @ W2_i                       (every boundary
             ends in a fresh MXU product for the next kernel)

Both run as N-kernel chains (distinct weights per kernel — round 3 ruled
out weights-identity effects) and as isolated self-feeding scans; the
per-boundary tax is (T_chain - N*T_isolated)/(N-1). If the shifted tax is
not materially lower, the boundary cost is launch/fill overhead invariant
to boundary content, and building the real shifted kernels cannot pay.

Usage: python tools/exp_boundary_shift.py [B] [L] [N]
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

from bench_util import time_steps  # noqa: E402

F32 = jnp.float32
BF16 = jnp.bfloat16


def _mm(x, w):
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=F32,
    )


def _ln(x32, d):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    c = x32 - mean
    var = jnp.sum(c * c, axis=-1, keepdims=True) / max(d - 1, 1)
    return c / (jnp.sqrt(jnp.maximum(var, 1e-24)) + 1e-6)


def _plain_kernel(x_ref, w1_ref, w2_ref, o_ref, *, d):
    x = x_ref[...]
    x32 = x.astype(F32)
    n = _ln(x32, d).astype(x.dtype)
    h = jnp.maximum(_mm(n, w1_ref[...]), 0.0).astype(x.dtype)
    z = _mm(h, w2_ref[...])
    o_ref[...] = (x32 + z).astype(x.dtype)


def _shift_kernel(xr_ref, pre_ref, w2_ref, w1n_ref, o_ref, pre_out_ref, *, d):
    x32 = xr_ref[...].astype(F32)
    h = jnp.maximum(pre_ref[...].astype(F32), 0.0).astype(xr_ref.dtype)
    z = _mm(h, w2_ref[...])
    out32 = x32 + z
    out = out32.astype(xr_ref.dtype)
    o_ref[...] = out
    # the boundary-shifted tail: next kernel's LN + first matmul
    n = _ln(out32, d).astype(out.dtype)
    pre_out_ref[...] = _mm(n, w1n_ref[...]).astype(out.dtype)


def make_calls(b, l, d, d3, bb):
    blk = pl.BlockSpec((bb, l, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec((bb, l, d3), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    mat = lambda m, n: pl.BlockSpec((m, n), lambda i: (0, 0),  # noqa: E731
                                    memory_space=pltpu.VMEM)

    plain = pl.pallas_call(
        functools.partial(_plain_kernel, d=d),
        grid=(b // bb,),
        in_specs=[blk, mat(d, d3), mat(d3, d)],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b, l, d), BF16),
    )
    shifted = pl.pallas_call(
        functools.partial(_shift_kernel, d=d),
        grid=(b // bb,),
        in_specs=[blk, blk3, mat(d3, d), mat(d, d3)],
        out_specs=(blk, blk3),
        out_shape=(jax.ShapeDtypeStruct((b, l, d), BF16),
                   jax.ShapeDtypeStruct((b, l, d3), BF16)),
    )
    return plain, shifted


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
    return dt / repeat


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    d, d3, bb = 128, 384, 4

    plain, shifted = make_calls(B, L, d, d3, bb)
    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(B, L, d) * 0.1, dtype=BF16)
    W1 = [jnp.asarray(rs.randn(d, d3) * 0.05, dtype=BF16) for _ in range(N)]
    W2 = [jnp.asarray(rs.randn(d3, d) * 0.05, dtype=BF16) for _ in range(N)]

    # isolated units (self-feeding scans)
    t_iso_plain = measure(lambda xx: plain(xx, W1[0], W2[0]), x0,
                          "isolated plain kernel")

    pre0 = jnp.asarray(rs.randn(B, L, d3) * 0.1, dtype=BF16)
    t_iso_shift = measure(
        lambda st: shifted(st[0], st[1], W2[0], W1[0]), (x0, pre0),
        "isolated shifted kernel")

    # N-kernel chains, distinct weights
    def chain_plain(xx):
        for i in range(N):
            xx = plain(xx, W1[i], W2[i])
        return xx

    t_chain_plain = measure(chain_plain, x0, f"chained plain x{N}")

    def chain_shift(st):
        xx, pre = st
        for i in range(N):
            xx, pre = shifted(xx, pre, W2[i], W1[(i + 1) % N])
        return (xx, pre)

    t_chain_shift = measure(chain_shift, (x0, pre0), f"chained shifted x{N}")

    tax_plain = (t_chain_plain - N * t_iso_plain) / (N - 1) * 1e3
    tax_shift = (t_chain_shift - N * t_iso_shift) / (N - 1) * 1e3
    print(f"\nper-boundary tax  plain   {tax_plain:7.1f} us")
    print(f"per-boundary tax  shifted {tax_shift:7.1f} us")
    verdict = ("SHIFT HELPS — build the real kernels"
               if tax_shift < 0.7 * tax_plain else
               "NEGATIVE — boundary cost is invariant to boundary content")
    print("verdict:", verdict)


if __name__ == "__main__":
    main()
