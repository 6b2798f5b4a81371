"""Fused Pallas TPU kernel for Sinkhorn scaling — the NeuralNDCG hot spot.

The XLA formulation (ops/soft_sort.py) carries the scaling vectors through a
``lax.scan``, but every iteration's matvec still streams the [N, L, L] matrix
from HBM: ~50 iters x 2 matvecs x (4*N*L^2 bytes) forward plus the same again
in the backward — ~3 GB of traffic per train step at N=64, L=240. This kernel
keeps each slate's matrix RESIDENT IN VMEM across all iterations (240x240
fp32 = 230 KB/slate, 8 slates per grid program), so HBM sees one read of M0
and one write of the result. Measured on a v5e chip at N=64, L=240: the
loss-gradient chain drops from 6.7 ms (XLA) to 4.8 ms.

Precision notes (hard-won):
  * The matvecs run as batched MXU matvecs with the vector as the fully
    CONTRACTED right operand — measured exact fp32 (rel ~3e-7 over the full
    50-iteration chain) and 1.5x faster than the VPU multiply-reduce; the
    transposed direction uses a once-per-kernel (loop-invariant) transpose
    of M0. 1-row-GEMV forms at default precision truncate to bf16 (~2e-3
    after 50 iterations) and the Sinkhorn gradient cancels heavily, turning
    that into O(1)-relative gradient error; Precision.HIGHEST fixes accuracy
    but pays 6 MXU passes and benches 2x slower than even the VPU form.
  * ``1.0 / x`` lowers to a low-precision reciprocal on TPU; the backward
    reconstructs matvec values with general division (``m_r / a_prev``)
    instead.
The kernel's forward agrees with a float64 host reference to 5e-7 (measured
at N=64, L=240, 50 iters with the MXU matvec form), vs ~3e-4 for the
XLA-on-TPU scan (reduced-precision fp32 einsum on MXU); the custom VJP
matches XLA autodiff within the fp32 tolerances pinned by the unit tests.

Semantics: identical to ``sinkhorn_scaling``'s fixed-point iteration (column
normalize, then row normalize, eps-clamped), EXCEPT the early-convergence
freeze: the kernel always runs ``max_iter`` iterations; post-convergence
iterations move row/col sums by < tol.

Math of the fused form: any sequence of row/column scalings is
``P = diag(a) @ M0 @ diag(b)``; the iteration is

    c_t = b_{t-1} * (M0^T a_{t-1});  b_t = b_{t-1} / max(c_t, eps)
    r_t = a_{t-1} * (M0 b_t);        a_t = a_{t-1} / max(r_t, eps)

The backward replays the recurrence from stored per-iteration histories and
collects its rank-1 dM0 contributions as row-stacked [T, L] factors, turning
the accumulation into two [L, T] @ [T, L] MXU matmuls at the end:

    dM0 = dP .* outer(a_T, b_T) + U^T Bh + Ah^T V
    with u_t = dr_t * a_{t-1},  v_t = dc_t * b_{t-1}.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from allrank_tpu.constants import DEFAULT_EPS

# keep in sync with ops/soft_sort.SCALING_CAP (defined locally to keep this
# Mosaic module's import graph flat)
_SCALING_CAP = 1e15

F32 = jnp.float32


def _matvec_T(m0t, a):
    """[S,L] x [S,L,L] -> [S,L]: (M0^T a) per slate, on the PRE-TRANSPOSED
    ``m0t`` (callers hoist one transpose per kernel — m0 is loop-invariant).

    Batched MXU matvec with the vector as the fully-contracted RIGHT
    operand: measured EXACT at fp32 (rel ~3e-7 over a 50-iteration
    compounding Sinkhorn chain, same as the VPU multiply-reduce) and 1.5x
    faster. The row-vector form (vector as a 1-row LEFT operand) is NOT
    exact (~2e-3 after 50 iterations) and the heavily-cancelling gradient
    chain cannot tolerate it; nor is Precision.HIGHEST viable (6 passes,
    2x slower than VPU)."""
    return jax.lax.dot_general(m0t, a, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=F32)


def _matvec(m0, b):
    """[S,L,L] x [S,L] -> [S,L]: (M0 b) per slate; same exact MXU batched
    matvec form as ``_matvec_T`` (see its docstring)."""
    return jax.lax.dot_general(m0, b, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=F32)


def sinkhorn_loop(m0_ref, a_it, b_it, m0t_ref, *, max_iter: int):
    """In-kernel fixed-trip Sinkhorn on a VMEM-resident ``m0`` [S, L, L],
    recording the scaling trajectories into ITERATION-MAJOR [T+1, S, L]
    VMEM scratch refs (every per-iteration store is then a whole-tile
    leading-axis offset; a dynamic index on the sublane axis of a
    [S, T+1, L] ref costs a masked relayout per access — measured 1.26x
    on the whole fused chain at N=2048, L=240). Returns the final (a, b).
    Shared by the standalone kernel and the fully-fused neural-sort kernel
    (ops/neuralsort_pallas.py); callers export to the slate-major HBM
    layout with one transpose per program."""
    s, l, _ = m0_ref.shape
    # every big loop operand is a REF (m0_ref: the kernel input block or a
    # caller-filled scratch; m0t_ref: scratch holding the loop-invariant
    # transpose). A bare VALUE computed by a long chain (the neural-sort
    # m0) is fair game for Mosaic rematerialization under VMEM pressure,
    # which re-runs the chain EVERY loop iteration (measured ~7x on the
    # fused backward's per-iteration slope); loop-body ref reads are plain
    # VMEM loads and cannot be rematerialized into recompute
    m0t_ref[...] = jnp.transpose(m0_ref[...], (0, 2, 1))
    ones = jnp.ones((s, l), dtype=F32)
    a_it[0] = ones
    b_it[0] = ones

    def body(t, carry):
        a, b = carry
        col = b * _matvec_T(m0t_ref[...], a)
        # exactly-zero columns/rows (softmax underflow under huge score
        # spreads) freeze their scaling instead of dividing by eps — the
        # unguarded diagonal form compounds 1/eps per iteration into inf and
        # the final a*m0*b into inf*0=NaN (found by tools/fuzz_losses.py).
        # The analytic backward needs no gate: every cotangent through a
        # frozen scaling multiplies the zero m0 column/row, so it vanishes
        # identically either way.
        # the SCALING_CAP saturation (see ops/soft_sort.py) bounds the
        # factored representation when the matrix admits no doubly
        # stochastic scaling; inactive bits in every healthy case, and the
        # stored trajectories stay finite so the analytic backward cannot
        # emit NaN (a capped slate's gradient is junk-but-finite, confined
        # to that slate by the per-slate factorization)
        b2 = jnp.where(col == 0.0, b,
                       jnp.minimum(b / jnp.maximum(col, DEFAULT_EPS),
                                   _SCALING_CAP))
        row = a * _matvec(m0_ref[...], b2)
        a2 = jnp.where(row == 0.0, a,
                       jnp.minimum(a / jnp.maximum(row, DEFAULT_EPS),
                                   _SCALING_CAP))
        a_it[t + 1] = a2
        b_it[t + 1] = b2
        return (a2, b2)

    return jax.lax.fori_loop(0, max_iter, body, (ones, ones))


def _fwd_kernel(m0_ref, p_ref, a_hist_ref, b_hist_ref, a_it, b_it, m0t_s,
                *, max_iter: int):
    a, b = sinkhorn_loop(m0_ref, a_it, b_it, m0t_s, max_iter=max_iter)
    m0 = m0_ref[:]
    p_ref[:] = a[:, :, None] * m0 * b[:, None, :]
    # one relayout per program to the slate-major HBM layout (blocks with a
    # full [T+1, L] trailing tile are legal for any slate-block size)
    a_hist_ref[...] = jnp.transpose(a_it[:], (1, 0, 2))
    b_hist_ref[...] = jnp.transpose(b_it[:], (1, 0, 2))


def sinkhorn_bwd_core(m0_ref, a_it, b_it, a_hist_sm, b_hist_sm, dp,
                      u_scratch, v_scratch, m0t_ref, *, max_iter: int):
    """In-kernel reverse pass: dM0 [S, L, L] from the output cotangent ``dp``
    and the stored forward trajectories. All operands VMEM-resident.

    ``a_it``/``b_it``: iteration-major [T+1, S, L] scratch the caller filled
    by transposing the saved histories (all loop reads are leading-axis);
    ``a_hist_sm``/``b_hist_sm``: the slate-major [S, T+1, L] history refs,
    used only by the final batched MXU matmuls (Mosaic requires the batch
    dim leading). ``u_scratch``/``v_scratch``: [T, S, L]. The loop carries
    (a_t, b_t) so each iteration issues ONE new read per trajectory."""
    # loop-invariant transpose, pinned in scratch (see sinkhorn_loop)
    m0t_ref[...] = jnp.transpose(m0_ref[...], (0, 2, 1))
    a_T = a_it[max_iter]
    b_T = b_it[max_iter]

    # dP -> (da_T, db_T) through P = a_T (.) M0 (.) b_T
    g = dp * m0_ref[...]
    da = jnp.sum(g * b_T[:, None, :], axis=2)
    db = jnp.sum(g * a_T[:, :, None], axis=1)
    # canonicalize the carry layout by round-tripping through VMEM scratch:
    # a fori_loop carry INHERITS the layout of its entry value, and these
    # reduction-produced [S, L] values carry a layout the loop body then
    # pays a relayout for EVERY iteration (measured 6x on the per-iteration
    # slope: 1.94 -> 0.34 ms at N=2048, L=240). The slots are overwritten
    # by the real u_0 / v_0 later in the loop.
    u_scratch[0] = da
    v_scratch[0] = db
    da = u_scratch[0]
    db = v_scratch[0]

    # The iteration's matvec values are recovered ELEMENTWISE from the stored
    # trajectories (m_r = a_{t-1}/a_t = max(r_t, eps); (M0 b_t) = m_r/a_{t-1})
    # — valid because the forward's VPU histories carry exact fp32 accuracy;
    # with reduced-precision MXU histories the ~3e-4 reconstruction error
    # destroys the heavily-cancelling gradient. Only the two matvecs applying
    # M0 to NEW cotangent vectors remain per iteration.
    clamp_gate = DEFAULT_EPS * 1.0001

    def body(i, carry):
        da, db, a_t, b_t = carry
        t = max_iter - i  # t = T .. 1
        a_prev = a_it[t - 1]
        b_prev = b_it[t - 1]

        m_r = a_prev / a_t                   # max(r_t, eps)
        m_c = b_prev / b_t                   # max(c_t, eps)
        mb = m_r / a_prev                    # (M0 b_t)
        mta = m_c / b_prev                   # (M0^T a_{t-1})

        # a_t = a_prev / m_r
        da_prev = da / m_r
        dr = jnp.where(m_r > clamp_gate, -da * a_prev / (m_r * m_r), 0.0)
        # r_t = a_prev * (M0 b_t)
        da_prev = da_prev + dr * mb
        u = dr * a_prev
        u_scratch[t - 1] = u                 # dM0 += outer(u, b_t), batched below
        db_t_cot = db + _matvec_T(m0t_ref[...], u)

        # b_t = b_prev / m_c
        db_prev = db_t_cot / m_c
        dc = jnp.where(m_c > clamp_gate, -db_t_cot * b_prev / (m_c * m_c), 0.0)
        # c_t = b_prev * (M0^T a_{t-1})
        db_prev = db_prev + dc * mta
        v = dc * b_prev
        v_scratch[t - 1] = v                 # dM0 += outer(a_{t-1}, v), batched below
        da_prev = da_prev + _matvec(m0_ref[...], v)

        return (da_prev, db_prev, a_prev, b_prev)

    jax.lax.fori_loop(0, max_iter, body, (da, db, a_T, b_T))

    # batched rank-1 accumulation as two MXU matmuls:
    #   sum_t outer(u_t, b_t) = U^T Bh,  sum_t outer(a_{t-1}, v_t) = Ah^T V
    # (u/v relayout once to slate-major; a/b rows come straight from the
    # untransposed refs — Mosaic dot_general needs the batch dim leading)
    u_all = jnp.transpose(u_scratch[:], (1, 0, 2))    # [S, T, L]
    v_all = jnp.transpose(v_scratch[:], (1, 0, 2))
    b_hist = b_hist_sm[:, 1:max_iter + 1, :]   # b_t rows
    a_hist = a_hist_sm[:, 0:max_iter, :]       # a_{t-1} rows

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


def _bwd_kernel(m0_ref, a_hist_ref, b_hist_ref, dp_ref, dm_ref,
                a_it, b_it, u_scratch, v_scratch, m0t_s, *, max_iter: int):
    a_it[...] = jnp.transpose(a_hist_ref[:], (1, 0, 2))
    b_it[...] = jnp.transpose(b_hist_ref[:], (1, 0, 2))
    dm_ref[:] = sinkhorn_bwd_core(
        m0_ref, a_it, b_it, a_hist_ref, b_hist_ref, dp_ref[:],
        u_scratch, v_scratch, m0t_s, max_iter=max_iter,
    )


def _pick_block(n: int, l: int, n_mats: int, max_iter: int,
                largest: int = 8, n_scratch: int = 2) -> int:
    """Slates per grid program under the 16 MB scoped-VMEM limit. ``n_mats``
    counts the [S, L, L] in/out blocks and the two [S, T+1, L] histories are
    blocks too — Mosaic double-buffers every block to pipeline the grid, so
    their bytes count twice against a ~14 MB budget (2 MB headroom for the
    compiler's own scratch). ``n_scratch`` counts the single-buffered
    iteration-major [T+1, S, L] scratch trajectories."""
    budget = 14 * 1024 * 1024
    per_slate = (2 * (n_mats * l * l * 4 + 2 * (max_iter + 1) * l * 4)
                 + n_scratch * (max_iter + 1) * l * 4)
    cap = max(1, min(largest, budget // max(1, per_slate)))
    for s in range(cap, 0, -1):
        if n % s == 0:
            return s
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def sinkhorn_core_fused(m0: jnp.ndarray, max_iter: int = 50) -> jnp.ndarray:
    """Fixed-trip Sinkhorn on pre-masked matrices [N, L, L] (fp32)."""
    p, _, _ = _sinkhorn_fwd_call(m0, max_iter)
    return p


def _sinkhorn_fwd_call(m0, max_iter):
    n, l, _ = m0.shape
    s = _pick_block(n, l, n_mats=3, max_iter=max_iter)  # m0 + m0t + P
    grid = (n // s,)
    kernel = functools.partial(_fwd_kernel, max_iter=max_iter)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((s, l, l), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((s, l, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, max_iter + 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, max_iter + 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, l, l), F32),
            jax.ShapeDtypeStruct((n, max_iter + 1, l), F32),
            jax.ShapeDtypeStruct((n, max_iter + 1, l), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((max_iter + 1, s, l), F32),
            pltpu.VMEM((max_iter + 1, s, l), F32),
            pltpu.VMEM((s, l, l), F32),
        ],
    )(m0.astype(F32))


def _sinkhorn_fwd(m0, max_iter):
    p, a_hist, b_hist = _sinkhorn_fwd_call(m0, max_iter)
    return p, (m0, a_hist, b_hist)


def _sinkhorn_bwd(max_iter, residuals, dp):
    m0, a_hist, b_hist = residuals
    n, l, _ = m0.shape
    # the backward holds 4 [S, L, L] blocks (m0, dP, dM out, temporaries)
    s = _pick_block(n, l, n_mats=5, max_iter=max_iter, largest=4,
                    n_scratch=4)
    grid = (n // s,)
    kernel = functools.partial(_bwd_kernel, max_iter=max_iter)
    dm = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, l, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, max_iter + 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, max_iter + 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, l, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s, l, l), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, l, l), F32),
        scratch_shapes=[
            pltpu.VMEM((max_iter + 1, s, l), F32),
            pltpu.VMEM((max_iter + 1, s, l), F32),
            pltpu.VMEM((max_iter, s, l), F32),
            pltpu.VMEM((max_iter, s, l), F32),
            pltpu.VMEM((s, l, l), F32),
        ],
    )(m0.astype(F32), a_hist, b_hist, dp.astype(F32))
    return (dm,)


sinkhorn_core_fused.defvjp(_sinkhorn_fwd, _sinkhorn_bwd)
