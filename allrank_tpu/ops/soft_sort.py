"""Differentiable sorting primitives: NeuralSort relaxation + Sinkhorn scaling.

Re-designs the reference's soft-sort utilities
(reference: allrank/models/losses/loss_utils.py:8-112) as fully vectorized,
jit-stable JAX:

  * The reference builds the per-slate NeuralSort scaling vector with a Python
    list comprehension over host-synced mask sums (loss_utils.py:54-57) —
    a host/device sync per call. Here it is a closed-form ``where`` over an
    iota: scaling[j] = valid_n + 1 - 2*(j+1) for j < valid_n else 0.
  * Sinkhorn runs as a fixed-trip ``lax.scan`` in diagonal-scaling form
    (O(L) carried state) whose updates freeze once the tolerance is met —
    identical early-exit semantics to the reference's data-dependent
    ``break`` (loss_utils.py:21-26) but compilable and
    reverse-differentiable; on a single TPU chip it dispatches to the fused
    VMEM-resident Pallas kernel (ops/sinkhorn_pallas.py), and
    ``sinkhorn_scaling_sp`` shards the slate axis across a mesh for
    sequence-parallel execution on very long slates.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from allrank_tpu.constants import DEFAULT_EPS

# Sinkhorn scaling-factor saturation. When the input matrix's support
# admits no doubly stochastic scaling (degenerate one-hot rows from huge
# score spreads — found by tools/fuzz_losses.py), the MATRIX iterates stay
# bounded but the factored (a, b) representation diverges geometrically
# (measured 6x/iteration) and overflows fp32 near max_iter=50, turning
# a*m0*b into inf/NaN. Healthy scalings stay orders of magnitude below this
# cap (it is bit-inactive there); a capped degenerate slate yields a finite
# non-converged matrix — the same class of result the reference's mat-form
# produces — and cannot poison other slates (per-slate factorization).
SCALING_CAP = 1e15


def _batch_shard_axes(phys, batch: int):
    """The largest tuple of mesh axes whose size product divides ``batch``
    (greedy data -> model -> sequence), or None when there is no mesh.
    Size-1 axes are kept so 1-device meshes still exercise shard_map."""
    if phys is None:
        return None
    from allrank_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQUENCE_AXIS

    chosen = []
    prod = 1
    for a in (DATA_AXIS, MODEL_AXIS, SEQUENCE_AXIS):
        if a in phys.shape and batch % (prod * phys.shape[a]) == 0:
            chosen.append(a)
            prod *= phys.shape[a]
    return tuple(chosen) if chosen else None


def per_shard_batch(batch: int):
    """Leading-dim rows a kernel invocation sees under the current dispatch
    regime: ``batch`` itself on a bare single chip, the per-shard slice under
    an ambient mesh (every divisible axis claimed), or None when no legal
    dispatch exists (multi-device without a mesh, or a mesh none of whose
    axes divides ``batch``). The availability half of the shared mesh-gate
    used by every batch-sharded Pallas dispatcher."""
    from allrank_tpu.parallel.mesh import ambient_mesh

    phys = ambient_mesh()
    if phys is not None:
        axes = _batch_shard_axes(phys, batch)
        if axes is None:
            return None
        shards = 1
        for a in axes:
            shards *= phys.shape[a]
        return batch // shards
    return batch if jax.device_count() == 1 else None


def dispatch_batch_sharded(fn, args, n_out: int = 1, check_vma: bool = False):
    """Run ``fn(*args)`` directly on a bare single chip, or per-shard via
    ``shard_map`` over every mesh axis that divides the leading batch dim of
    ``args[0]`` (the pod code path — pallas_call has no SPMD partition rule).
    ``fn`` must map batch-major arrays to ``n_out`` batch-major arrays, with
    all non-batch structure closed over. The execution half of the shared
    mesh-gate; callers guarantee legality via ``per_shard_batch`` first.

    ``check_vma`` stays False for pallas bodies (their outputs carry no vma
    info); the replication structure of these specs is pinned by a
    vma-checked XLA twin in tests/ops/test_vma_canary.py."""
    from allrank_tpu.parallel.mesh import ambient_mesh

    phys = ambient_mesh()
    axes = _batch_shard_axes(phys, args[0].shape[0]) if phys is not None else None
    if axes is None:
        return fn(*args)
    from jax.sharding import PartitionSpec as P

    spec = P(axes)
    return jax.shard_map(
        fn,
        mesh=phys,
        in_specs=(spec,) * len(args),
        out_specs=spec if n_out == 1 else (spec,) * n_out,
        check_vma=check_vma,
    )(*args)


def batch_shard_hint(flat: jnp.ndarray) -> jnp.ndarray:
    """Under jit with an ambient mesh, constrain the leading (flattened
    sample*batch) axis of ``flat`` to shard over every divisible mesh axis —
    the sample-folding that lets stochastic NeuralNDCG's n_samples dimension
    ride otherwise-idle model/sequence shards. No-op outside tracing."""
    import jax.core

    from allrank_tpu.parallel.mesh import ambient_mesh

    phys = ambient_mesh()
    if phys is None or not isinstance(flat, jax.core.Tracer):
        return flat
    axes = _batch_shard_axes(phys, flat.shape[0])
    if axes is None:
        return flat
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(axes, *([None] * (flat.ndim - 1)))
    return jax.lax.with_sharding_constraint(flat, NamedSharding(phys, spec))


def sinkhorn_scaling(
    mat: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    tol: float = 1e-6,
    max_iter: int = 50,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Row/column renormalization to an (approximately) doubly stochastic matrix.

    mat: [N, M, M]; mask: optional [N, M] padding mask (True = padded).
    Matches reference semantics: padded rows/cols zeroed, fully-padded
    diagonal-block entries set to 1 before scaling, and re-zeroed after;
    column normalization first, then rows; updates freeze globally once both
    residuals drop below ``tol`` (the reference's early ``break``).

    TPU-first formulation: every sequence of row/column scalings composes to
    ``diag(a) @ M0 @ diag(b)``, so the iteration is carried as the two [N, M]
    scaling vectors with one matvec per half-step — the [N, M, M] matrix is
    never materialized per iteration. This cuts the naive version's
    O(max_iter * M^2) HBM writes (and its backward's rematerialized reads) to
    O(max_iter * M) state, leaving one final rank-1-scaled write of M0.
    """
    if mask is not None:
        either = mask[:, None, :] | mask[:, :, None]
        both = mask[:, None, :] & mask[:, :, None]
        mat = jnp.where(either, 0.0, mat)
        mat = jnp.where(both, 1.0, mat)

    from allrank_tpu.ops import autotune

    if backend == "pallas" or (
        backend is None
        and jax.default_backend() == "tpu"
        # cap: the backward kernel holds 4 [1, L, L] blocks at minimum —
        # beyond L~768 (v5e default; per-device autotune table) even a
        # single-slate block exceeds the VMEM budget
        and mat.shape[-1] <= autotune.get("sinkhorn_max_fused_len")
    ):
        # fused VMEM-resident kernel (fixed-trip; see ops/sinkhorn_pallas.py).
        # pallas_call has no SPMD partition rule, so on a device mesh the
        # kernel runs per-shard under shard_map over the batch ('data') axis;
        # single chip calls it directly.
        from allrank_tpu.ops.sinkhorn_pallas import sinkhorn_core_fused

        from allrank_tpu.parallel.mesh import ambient_mesh

        fused = None
        phys = ambient_mesh()
        axes = _batch_shard_axes(phys, mat.shape[0])
        if axes is not None:
            # mesh context (any size, incl. 1-device): per-shard via
            # shard_map over every mesh axis that divides the flattened
            # batch — for stochastic NeuralNDCG the [S*B] axis spreads the
            # sample dimension across otherwise-idle model/sequence shards
            # (each matrix's scaling is independent, so any split is exact)
            from jax.sharding import PartitionSpec as P

            fused = jax.shard_map(
                lambda m: sinkhorn_core_fused(m, max_iter),
                mesh=phys,
                in_specs=P(axes),
                out_specs=P(axes),
                # pallas outputs carry no vma info; this dispatch's
                # replication structure is pinned by a vma-checked XLA twin
                # (tests/ops/test_vma_canary.py::test_sinkhorn_fused_...)
                check_vma=False,
            )
        elif jax.device_count() == 1:
            fused = lambda m: sinkhorn_core_fused(m, max_iter)  # noqa: E731
        if fused is not None:
            mat = fused(mat.astype(jnp.float32))
            if mask is not None:
                mat = jnp.where(mask[:, None, :] | mask[:, :, None], 0.0, mat)
            return mat
        # no usable mesh context -> fall through to the XLA scan

    m0 = mat
    n, m = mat.shape[0], mat.shape[1]
    ones = jnp.ones((n, m), dtype=mat.dtype)

    def one_iteration(carry, _):
        a, b, done, row_resid = carry
        # column sums of the current matrix diag(a) m0 diag(b)
        col = b * jnp.einsum("nij,ni->nj", m0, a)
        # convergence of the PREVIOUS full iteration: its row sums are 1 by
        # construction up to eps-clamping (tracked in row_resid); its column
        # sums are exactly `col`
        resid = jnp.maximum(jnp.max(jnp.abs(col - 1.0)), row_resid)
        done = jnp.logical_or(done, resid < tol)

        # an EXACTLY-zero column (softmax underflow under huge score
        # spreads) can never be normalized: freeze its scaling instead of
        # dividing by eps every iteration (the diagonal form would blow b
        # up to inf and the final a*m0*b to inf*0=NaN; the mat form this
        # mirrors keeps 0/eps = 0 — found by tools/fuzz_losses.py)
        b2 = jnp.where(done | (col == 0.0), b,
                       jnp.minimum(b / jnp.maximum(col, DEFAULT_EPS),
                                   SCALING_CAP))
        row = a * jnp.einsum("nij,nj->ni", m0, b2)
        a2 = jnp.where(done | (row == 0.0), a,
                       jnp.minimum(a / jnp.maximum(row, DEFAULT_EPS),
                                   SCALING_CAP))
        new_row_resid = jnp.where(
            done,
            row_resid,
            jnp.max(jnp.abs(row / jnp.maximum(row, DEFAULT_EPS) - 1.0)),
        )
        return (a2, b2, done, new_row_resid), None

    (a, b, _, _), _ = jax.lax.scan(
        one_iteration,
        (ones, ones, jnp.asarray(False), jnp.asarray(jnp.inf, dtype=mat.dtype)),
        None,
        length=max_iter,
    )
    mat = a[:, :, None] * m0 * b[:, None, :]

    if mask is not None:
        mat = jnp.where(mask[:, None, :] | mask[:, :, None], 0.0, mat)
    return mat


def deterministic_neural_sort(
    s: jnp.ndarray, tau: float, mask: jnp.ndarray
) -> jnp.ndarray:
    """NeuralSort relaxation ("Stochastic Optimization of Sorting Networks via
    Continuous Relaxations", ICLR 2019) with padding support.

    s: [N, L] scores; mask: [N, L] True at padded positions.
    Returns approximate permutation matrices [N, L, L] (row i ~ one-hot of the
    i-th largest element).
    """
    n = s.shape[1]
    s = jnp.where(mask, -1e8, s)

    a_s = jnp.abs(s[:, :, None] - s[:, None, :])
    pair_pad = mask[:, :, None] | mask[:, None, :]
    a_s = jnp.where(pair_pad, 0.0, a_s)
    row_sums = jnp.sum(a_s, axis=2)  # B_ij = sum_k A_s[i, k], j-independent

    valid_n = (n - jnp.sum(mask, axis=1)).astype(jnp.float32)  # [N]
    j = jnp.arange(1, n + 1, dtype=jnp.float32)  # 1-based rank position
    scaling = jnp.where(
        j[None, :] <= valid_n[:, None], valid_n[:, None] + 1.0 - 2.0 * j[None, :], 0.0
    )  # [N, L]

    s_zeroed = jnp.where(mask, 0.0, s)
    # P_max[i, j] = scaling_i * s_j - rowsum_j  (the transpose of C - B)
    p_max = scaling[:, :, None] * s_zeroed[:, None, :] - row_sums[:, None, :]

    p_max = jnp.where(pair_pad, -jnp.inf, p_max)
    both_pad = mask[:, :, None] & mask[:, None, :]
    p_max = jnp.where(both_pad, 1.0, p_max)
    return jax.nn.softmax(p_max / tau, axis=-1)


def sample_gumbel(rng: jax.Array, shape, eps: float = 1e-10) -> jnp.ndarray:
    """Gumbel(0, 1) samples via inverse CDF of uniform draws."""
    u = jax.random.uniform(rng, shape, dtype=jnp.float32)
    return -jnp.log(-jnp.log(u + eps) + eps)


def perturbed_scores(
    s: jnp.ndarray,
    n_samples: int,
    rng: jax.Array,
    beta: float = 1.0,
    log_scores: bool = True,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Gumbel-perturbed score samples, flattened sample-major: [S*N, L]."""
    batch, n = s.shape
    s_positive = s + jnp.abs(jnp.min(s))
    if log_scores:
        s_positive = jnp.log(s_positive + eps)
    gumbel = beta * sample_gumbel(rng, (n_samples, batch, n))
    return (s_positive[None, :, :] + gumbel).reshape(n_samples * batch, n)


def stochastic_neural_sort(
    s: jnp.ndarray,
    n_samples: int,
    tau: float,
    mask: jnp.ndarray,
    rng: jax.Array,
    beta: float = 1.0,
    log_scores: bool = True,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Gumbel-perturbed NeuralSort. s: [N, L]; returns [n_samples, N, L, L].

    Note: the reference flattens [S, N] sample-major but repeats its mask
    batch-major (loss_utils.py:108 repeat_interleave), silently misaligning
    masks for N > 1; here masks are tiled sample-major to match the data.
    """
    batch, n = s.shape
    s_perturb = perturbed_scores(s, n_samples, rng, beta, log_scores, eps)
    mask_tiled = jnp.tile(mask, (n_samples, 1))

    p_hat = deterministic_neural_sort(s_perturb, tau, mask_tiled)
    return p_hat.reshape(n_samples, batch, n, n)


def sequence_parallel_mesh(slate_length: int):
    """(mesh, axis) when the ambient mesh has a usable sequence axis for this
    slate length, else None — the dispatch gate for the SP soft-sort path."""
    from allrank_tpu.parallel.mesh import SEQUENCE_AXIS, ambient_mesh

    phys = ambient_mesh()
    if phys is None or SEQUENCE_AXIS not in phys.shape:
        return None
    size = phys.shape[SEQUENCE_AXIS]
    if size <= 1 or slate_length % size:
        return None
    return phys, SEQUENCE_AXIS


def soft_sort_contract_sp(
    scores: jnp.ndarray,
    mask: jnp.ndarray,
    vec: jnp.ndarray,
    tau: float,
    mesh,
    axis: str,
    max_iter: int = 50,
    tol: float = 1e-6,
    transpose: bool = False,
) -> jnp.ndarray:
    """Fully sequence-parallel NeuralSort → Sinkhorn → vector contraction.

    Computes ``P = sinkhorn(neural_sort(scores, tau))`` with the [N, L, L]
    permutation relaxations sharded over their RANK-ROW axis across
    ``mesh[axis]`` — the [L, L] matrix is never materialized on one device —
    then immediately contracts with ``vec [N, L]``:

      * transpose=False: out[n, i] = Σ_j P[n, i, j] · vec[n, j]
        (soft-sorted gains, the normal NeuralNDCG contraction)
      * transpose=True:  out[n, j] = Σ_i P[n, i, j] · vec[n, i]
        (expected discounts, the transposed variant)

    Per Sinkhorn iteration one psum of an O(L) vector crosses shards; the
    neural-sort row-sum needs one more. Numerics mirror ``sinkhorn_scaling``'s
    XLA path exactly (same tol-freeze), so values match the replicated path
    to float error. This is the slate-axis "sequence parallelism" the
    reference lacks (its long-slate answer is subsampling,
    reference: allrank/data/dataset_loading.py:61-79).
    """
    from jax.sharding import PartitionSpec as P

    n_shards = mesh.shape[axis]
    n, length = scores.shape
    if length % n_shards:
        raise ValueError(f"slate length {length} not divisible by {n_shards}")
    l_block = length // n_shards

    def body(s, mask, vec):
        shard = jax.lax.axis_index(axis)
        r0 = shard * l_block
        s_filled = jnp.where(mask, -1e8, s)
        m_local = jax.lax.dynamic_slice_in_dim(mask, r0, l_block, axis=1)

        # neural-sort row sums: B_j = Σ_k |s_j − s_k| over valid pairs,
        # accumulated from each shard's k-chunk (one psum of [N, L])
        s_local = jax.lax.dynamic_slice_in_dim(s_filled, r0, l_block, axis=1)
        diffs = jnp.abs(s_filled[:, :, None] - s_local[:, None, :])  # [N, L, Lb]
        diffs = jnp.where(mask[:, :, None] | m_local[:, None, :], 0.0, diffs)
        row_sums = jax.lax.psum(jnp.sum(diffs, axis=2), axis)  # [N, L]

        valid_n = (length - jnp.sum(mask, axis=1)).astype(jnp.float32)
        j_rank = jnp.arange(1, l_block + 1, dtype=jnp.float32) + r0  # [Lb]
        scaling = jnp.where(
            j_rank[None, :] <= valid_n[:, None],
            valid_n[:, None] + 1.0 - 2.0 * j_rank[None, :],
            0.0,
        )  # [N, Lb] — this shard's rank rows

        s_zeroed = jnp.where(mask, 0.0, s)
        p_max = scaling[:, :, None] * s_zeroed[:, None, :] - row_sums[:, None, :]
        pair_pad = m_local[:, :, None] | mask[:, None, :]
        both_pad = m_local[:, :, None] & mask[:, None, :]
        p_max = jnp.where(pair_pad, -jnp.inf, p_max)
        p_max = jnp.where(both_pad, 1.0, p_max)
        p_hat = jax.nn.softmax(p_max / tau, axis=-1)  # [N, Lb, L] row block

        # Sinkhorn pre-fill (reference loss_utils.py:27-29 semantics)
        m0 = jnp.where(pair_pad, 0.0, p_hat)
        m0 = jnp.where(both_pad, 1.0, m0)

        a = jnp.ones((n, l_block), dtype=m0.dtype)  # row scalings (sharded)
        b = jnp.ones((n, length), dtype=m0.dtype)   # col scalings (replicated)

        def one_iteration(carry, _):
            a, b, done, row_resid = carry
            col = b * jax.lax.psum(jnp.einsum("nij,ni->nj", m0, a), axis)
            resid = jnp.maximum(jnp.max(jnp.abs(col - 1.0)), row_resid)
            done = jnp.logical_or(done, resid < tol)
            # exactly-zero columns/rows freeze + scaling saturation
            # (see sinkhorn_scaling)
            b2 = jnp.where(done | (col == 0.0), b,
                           jnp.minimum(b / jnp.maximum(col, DEFAULT_EPS),
                                       SCALING_CAP))
            row = a * jnp.einsum("nij,nj->ni", m0, b2)  # local rows
            a2 = jnp.where(done | (row == 0.0), a,
                           jnp.minimum(a / jnp.maximum(row, DEFAULT_EPS),
                                       SCALING_CAP))
            # cross-shard max via all_gather (pmax has no differentiation
            # rule; the residual only drives the freeze flag)
            local_max = jnp.max(jnp.abs(row / jnp.maximum(row, DEFAULT_EPS) - 1.0))
            global_max = jnp.max(jax.lax.all_gather(local_max, axis))
            new_row_resid = jnp.where(done, row_resid, global_max)
            return (a2, b2, done, new_row_resid), None

        # the carry entries become axis-varying through the iteration (a and
        # row_resid structurally; done and b transitively via the freeze
        # flag), so mark every seed varying up front — the scan carry types
        # are then stable and the vma checker can verify the whole body
        seeds = (a, b, jnp.asarray(False), jnp.asarray(jnp.inf,
                                                       dtype=m0.dtype))
        seeds = tuple(jax.lax.pcast(s, axis, to="varying") for s in seeds)
        (a, b, _, _), _ = jax.lax.scan(
            one_iteration, seeds, None, length=max_iter,
        )
        p_scaled = a[:, :, None] * m0 * b[:, None, :]
        p_scaled = jnp.where(pair_pad, 0.0, p_scaled)

        if transpose:
            vec_local = jax.lax.dynamic_slice_in_dim(vec, r0, l_block, axis=1)
            return jax.lax.psum(
                jnp.einsum("nij,ni->nj", p_scaled, vec_local), axis
            )  # [N, L] replicated
        return jnp.einsum("nij,nj->ni", p_scaled, vec)  # [N, Lb] sharded

    out_spec = P() if transpose else P(None, axis)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=out_spec,
        # vma-checked since round 5 (carry seeds pcast to varying above);
        # a regression here fails loud at trace time
        check_vma=True,
    )(scores, mask, vec)


def sinkhorn_scaling_sp(
    mat: jnp.ndarray,
    mesh,
    axis: str = "model",
    mask: Optional[jnp.ndarray] = None,
    max_iter: int = 50,
) -> jnp.ndarray:
    """Sequence-parallel Sinkhorn: the [N, L, L] matrices sharded over their
    ROW axis across ``mesh[axis]`` — the slate-axis ("sequence parallel")
    extension for very long slates where even one L x L matrix strains a
    single chip (reference has no analog; its answer to long slates is
    subsampling, dataset_loading.py:61-79).

    In the diagonal form (see ``sinkhorn_scaling``) the split is natural:
      * a (row scalings) is row-sharded with the matrix; b is replicated;
      * column sums  b * (M0^T a)  need one ``psum`` over the axis;
      * row sums     a * (M0 b)    are fully local.
    One collective per iteration, O(L) bytes — the O(L^2) matrix never moves.
    """
    from jax.sharding import PartitionSpec as P

    if mask is not None:
        either = mask[:, None, :] | mask[:, :, None]
        both = mask[:, None, :] & mask[:, :, None]
        mat = jnp.where(either, 0.0, mat)
        mat = jnp.where(both, 1.0, mat)

    def local(m0):
        n, l_local, l = m0.shape
        a = jnp.ones_like(m0[:, :, 0])        # row shard (device-varying)
        b = jnp.ones((n, l), dtype=m0.dtype)  # replicated

        def one_iteration(carry, _):
            a, b = carry
            col_partial = jnp.einsum("nij,ni->nj", m0, a)
            col = b * jax.lax.psum(col_partial, axis)
            # exactly-zero columns/rows freeze + scaling saturation
            # (see sinkhorn_scaling)
            b2 = jnp.where(col == 0.0, b,
                           jnp.minimum(b / jnp.maximum(col, DEFAULT_EPS),
                                       SCALING_CAP))
            row = a * jnp.einsum("nij,nj->ni", m0, b2)  # local
            a2 = jnp.where(row == 0.0, a,
                           jnp.minimum(a / jnp.maximum(row, DEFAULT_EPS),
                                       SCALING_CAP))
            return (a2, b2), None

        (a, b), _ = jax.lax.scan(one_iteration, (a, b), None, length=max_iter)
        return a[:, :, None] * m0 * b[:, None, :]

    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
    )(mat)

    if mask is not None:
        out = jnp.where(mask[:, None, :] | mask[:, :, None], 0.0, out)
    return out
