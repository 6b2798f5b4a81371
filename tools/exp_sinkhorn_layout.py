"""A/B: Sinkhorn history access pattern inside the fused neural-sort kernel.

Variant A (current library): histories are [bb, T+1, L] refs; every loop
iteration reads/writes a dynamic index on the MIDDLE (sublane) axis — the
suspected Mosaic slow path (masked sublane gathers / relayouts per access).

Variant C: the kernel keeps an ITERATION-MAJOR [T+1, bb, L] VMEM scratch so
all per-iteration accesses are whole-tile leading-axis offsets; one transpose
per program converts to/from the (unchanged) HBM layout. The backward also
carries (a_t, b_t) across iterations so each step issues ONE new read per
history instead of two.

Usage: python tools/exp_sinkhorn_layout.py [N] [L]   (defaults 2048 240 —
the stochastic n_samples=32 x B=64 flagship shape)
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

from allrank_tpu.constants import DEFAULT_EPS  # noqa: E402
from allrank_tpu.ops.neuralsort_pallas import (  # noqa: E402
    _block,
    _chain,
    _contract,
    fused_soft_sort_contract,
)
from bench_util import time_steps  # noqa: E402

F32 = jnp.float32


def _matvec_T(m0, a):
    return jnp.sum(m0 * a[:, :, None], axis=1)


def _matvec(m0, b):
    return jnp.sum(m0 * b[:, None, :], axis=2)


# ------------- variant C: iteration-major scratch histories -------------

def sinkhorn_loop_C(m0, a_s, b_s, *, max_iter):
    """a_s, b_s: [T+1, S, L] VMEM scratch; leading-axis dynamic writes."""
    s, l, _ = m0.shape
    ones = jnp.ones((s, l), dtype=F32)
    a_s[0] = ones
    b_s[0] = ones

    def body(t, carry):
        a, b = carry
        col = b * _matvec_T(m0, a)
        b2 = b / jnp.maximum(col, DEFAULT_EPS)
        row = a * _matvec(m0, b2)
        a2 = a / jnp.maximum(row, DEFAULT_EPS)
        a_s[t + 1] = a2
        b_s[t + 1] = b2
        return (a2, b2)

    return jax.lax.fori_loop(0, max_iter, body, (ones, ones))


def _fwd_kernel_C(s_ref, pad_ref, vec_ref, out_ref, a_hist_ref, b_hist_ref,
                  a_s, b_s, *, tau, max_iter, transpose):
    s = s_ref[:, 0, :]
    m0, _, pair_pad_f, *_ = _chain(s, pad_ref[:, 0, :], tau=tau)
    a, b = sinkhorn_loop_C(m0, a_s, b_s, max_iter=max_iter)
    p = a[:, :, None] * m0 * b[:, None, :]
    p = jnp.where(pair_pad_f > 0.5, 0.0, p)
    out_ref[:, 0, :] = _contract(p, vec_ref[:, 0, :], transpose)
    # one relayout per program back to the slate-major HBM layout
    a_hist_ref[...] = jnp.transpose(a_s[:], (1, 0, 2))
    b_hist_ref[...] = jnp.transpose(b_s[:], (1, 0, 2))


def sinkhorn_bwd_core_C(m0, a_s, b_s, a_hist_sm, b_hist_sm, dp,
                        u_scratch, v_scratch, *, max_iter):
    """a_s/b_s: iteration-major [T+1, S, L] scratch already filled;
    a/b_hist_sm: the original slate-major [S, T+1, L] refs (used only for
    the final batched MXU matmuls, whose batch dim must lead).
    u/v_scratch: [T, S, L]. Carries (a_t, b_t) backward so each iteration
    reads one new history row per trajectory."""
    a_T = a_s[max_iter]
    b_T = b_s[max_iter]
    g = dp * m0
    da = jnp.sum(g * b_T[:, None, :], axis=2)
    db = jnp.sum(g * a_T[:, :, None], axis=1)
    clamp_gate = DEFAULT_EPS * 1.0001

    def body(i, carry):
        da, db, a_t, b_t = carry
        t = max_iter - i
        a_prev = a_s[t - 1]
        b_prev = b_s[t - 1]

        m_r = a_prev / a_t
        m_c = b_prev / b_t
        mb = m_r / a_prev
        mta = m_c / b_prev

        da_prev = da / m_r
        dr = jnp.where(m_r > clamp_gate, -da * a_prev / (m_r * m_r), 0.0)
        da_prev = da_prev + dr * mb
        u = dr * a_prev
        u_scratch[t - 1] = u
        db_t_cot = db + _matvec_T(m0, u)

        db_prev = db_t_cot / m_c
        dc = jnp.where(m_c > clamp_gate, -db_t_cot * b_prev / (m_c * m_c), 0.0)
        db_prev = db_prev + dc * mta
        v = dc * b_prev
        v_scratch[t - 1] = v
        da_prev = da_prev + _matvec(m0, v)
        return (da_prev, db_prev, a_prev, b_prev)

    jax.lax.fori_loop(0, max_iter, body, (da, db, a_T, b_T))

    # Mosaic dot_general needs the batch dim leading: relayout u/v once,
    # and read the a/b rows straight from the untransposed slate-major refs
    u_all = jnp.transpose(u_scratch[:], (1, 0, 2))    # [S, T, L]
    v_all = jnp.transpose(v_scratch[:], (1, 0, 2))
    b_hist = b_hist_sm[:, 1:max_iter + 1, :]          # [S, T, L]
    a_hist = a_hist_sm[:, 0:max_iter, :]

    def stacked(x_all, y_all):
        return jax.lax.dot_general(
            x_all, y_all,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=F32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [S, L, L]

    return (dp * a_T[:, :, None] * b_T[:, None, :]
            + stacked(u_all, b_hist)
            + stacked(a_hist, v_all))


def _bwd_kernel_C(s_ref, pad_ref, vec_ref, a_hist_ref, b_hist_ref, dout_ref,
                  ds_ref, a_s, b_s, u_scratch, v_scratch,
                  *, tau, max_iter, transpose):
    s = s_ref[:, 0, :]
    m0, p_hat, pair_pad_f, valid_f, s_filled, scaling = _chain(
        s, pad_ref[:, 0, :], tau=tau
    )
    vec = vec_ref[:, 0, :]
    dout = dout_ref[:, 0, :]
    if transpose:
        dp = dout[:, None, :] * vec[:, :, None]
    else:
        dp = dout[:, :, None] * vec[:, None, :]
    pair_valid = 1.0 - pair_pad_f
    dp = dp * pair_valid

    # one relayout per program into iteration-major scratch
    a_s[...] = jnp.transpose(a_hist_ref[:], (1, 0, 2))
    b_s[...] = jnp.transpose(b_hist_ref[:], (1, 0, 2))

    dm0 = sinkhorn_bwd_core_C(m0, a_s, b_s, a_hist_ref, b_hist_ref, dp,
                              u_scratch, v_scratch, max_iter=max_iter)

    dphat = dm0 * pair_valid
    inner = jnp.sum(dphat * p_hat, axis=2, keepdims=True)
    dpm = ((dphat - inner) * p_hat / tau) * pair_valid
    ds_zero = jnp.sum(dpm * scaling[:, :, None], axis=1)
    drs = -jnp.sum(dpm, axis=1)
    sgn = jnp.sign(s_filled[:, :, None] - s_filled[:, None, :]) * pair_valid
    ds_abs = drs * jnp.sum(sgn, axis=2) - jnp.sum(drs[:, :, None] * sgn,
                                                  axis=1)
    ds_ref[:, 0, :] = (ds_zero + ds_abs) * valid_f


@functools.lru_cache(maxsize=8)
def make_fused_C(tau, max_iter, transpose, L):
    kw = dict(tau=tau, max_iter=max_iter, transpose=transpose)

    def specs(bb):
        vec = pl.BlockSpec((bb, 1, L), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        hist = pl.BlockSpec((bb, max_iter + 1, L), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        return vec, hist

    @jax.custom_vjp
    def fused(s, pad, vec):
        out, _, _ = fwd_call(s, pad, vec)
        return out

    def fwd_call(s, pad, vec):
        n = s.shape[0]
        bb = _block(n, L, n_mats=5, max_iter=max_iter)
        vspec, hspec = specs(bb)
        out, a_hist, b_hist = pl.pallas_call(
            functools.partial(_fwd_kernel_C, **kw),
            grid=(n // bb,),
            in_specs=[vspec, vspec, vspec],
            out_specs=[vspec, hspec, hspec],
            out_shape=[
                jax.ShapeDtypeStruct((n, 1, L), F32),
                jax.ShapeDtypeStruct((n, max_iter + 1, L), F32),
                jax.ShapeDtypeStruct((n, max_iter + 1, L), F32),
            ],
            scratch_shapes=[
                pltpu.VMEM((max_iter + 1, bb, L), F32),
                pltpu.VMEM((max_iter + 1, bb, L), F32),
            ],
        )(s[:, None, :], pad[:, None, :], vec[:, None, :])
        return out[:, 0, :], a_hist, b_hist

    def fwd(s, pad, vec):
        out, a_hist, b_hist = fwd_call(s, pad, vec)
        return out, (s, pad, vec, a_hist, b_hist)

    def bwd(res, dout):
        s, pad, vec, a_hist, b_hist = res
        n = s.shape[0]
        bb = _block(n, L, n_mats=8, max_iter=max_iter)
        vspec, hspec = specs(bb)
        ds = pl.pallas_call(
            functools.partial(_bwd_kernel_C, **kw),
            grid=(n // bb,),
            in_specs=[vspec, vspec, vspec, hspec, hspec, vspec],
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((n, 1, L), F32),
            scratch_shapes=[
                pltpu.VMEM((max_iter + 1, bb, L), F32),
                pltpu.VMEM((max_iter + 1, bb, L), F32),
                pltpu.VMEM((max_iter, bb, L), F32),
                pltpu.VMEM((max_iter, bb, L), F32),
            ],
        )(s[:, None, :], pad[:, None, :], vec[:, None, :], a_hist, b_hist,
          dout.astype(F32)[:, None, :])
        zeros = jnp.zeros_like
        return ds[:, 0, :], zeros(pad), zeros(vec)

    fused.defvjp(fwd, bwd)
    return fused


def measure(fn, s0, pad, vec, label, repeat=8):
    def loss(s):
        return jnp.sum(fn(s, pad, vec))

    vg = jax.value_and_grad(loss)

    def step_fwd(s):
        return s + 1e-6 * fn(s, pad, vec)

    def step_vg(s):
        v, g = vg(s)
        return s + 1e-6 * g + 0.0 * v

    for name, step in (("fwd", step_fwd), ("fwd+bwd", step_vg)):
        def scanned(st, _step=step):
            return jax.lax.scan(lambda c, _: (_step(c), None), st,
                                None, length=repeat)[0]

        jitted = jax.jit(scanned)

        def once(st):
            st = jitted(st)
            return st, st.reshape(-1)[0]

        dt, _ = time_steps(once, s0, n1=3, n2=10)
        print(f"{label:28s} {name:8s} {dt / repeat * 1e3:8.3f} ms",
              flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    rng = np.random.RandomState(0)
    s0 = jnp.asarray(rng.randn(n, L).astype(np.float32))
    pad = jnp.zeros((n, L), F32).at[:, -40:].set(1.0)
    vec = jnp.asarray(rng.rand(n, L).astype(np.float32))

    base = functools.partial(fused_soft_sort_contract, tau=1.0, max_iter=50)
    varC = make_fused_C(1.0, 50, False, L)

    outA = base(s0, pad, vec)
    outC = varC(s0, pad, vec)
    gA = jax.grad(lambda s: jnp.sum(base(s, pad, vec)))(s0)
    gC = jax.grad(lambda s: jnp.sum(varC(s, pad, vec)))(s0)
    print("max |outA-outC| =", float(jnp.max(jnp.abs(outA - outC))))
    print("max |gA-gC|     =", float(jnp.max(jnp.abs(gA - gC))))

    measure(base, s0, pad, vec, f"A slate-major N={n} L={L}")
    measure(varC, s0, pad, vec, f"C iter-major  N={n} L={L}")


if __name__ == "__main__":
    main()
