"""Hardware checks for the Pallas kernel paths that CPU tests cannot cover.

Run on a TPU host: ``python tools/tpu_kernel_checks.py``. Validates:

1. **Mesh-dispatch kernel execution** (1-device mesh): the ``shard_map``
   branches of the fused Sinkhorn (ops/soft_sort.py) and fused attention
   (models/transformer.py) — the code paths that run on pods — execute on
   the real chip and match the direct-call results.
2. **In-kernel dropout of the K-tiled attention** (ops/attention_tiled.py):
   determinism given a seed, variation across seeds, inverted-dropout mean
   preservation, and gradient equality against an XLA re-implementation fed
   the kernel's own realized keep-mask (extracted with an identity-V probe).
   Interpret mode cannot test any of this: its on-core PRNG is a zero-stub.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from allrank_tpu.config import ParallelConfig
from allrank_tpu.constants import NEG_INF_FILL
from allrank_tpu.parallel import make_mesh

FAILURES = []


def check(name: str, ok: bool, detail: str = "") -> None:
    print(f"{name:55s} {'OK' if ok else 'FAIL'} {detail}")
    if not ok:
        FAILURES.append(name)


def check_sinkhorn_mesh_dispatch() -> None:
    from allrank_tpu.ops.soft_sort import sinkhorn_scaling

    rng = np.random.RandomState(0)
    mat = jnp.asarray(np.abs(rng.randn(8, 240, 240)).astype(np.float32))
    mask = jnp.asarray(np.arange(240)[None, :] >= 200).repeat(8, axis=0)

    direct = np.asarray(sinkhorn_scaling(mat, mask))  # no mesh: direct kernel
    mesh = make_mesh(ParallelConfig(data=1, model=1))
    with mesh:
        meshed = np.asarray(jax.jit(
            lambda m: sinkhorn_scaling(m, mask)
        )(mat))
    err = np.abs(direct - meshed).max()
    check("sinkhorn shard_map(1-device mesh) vs direct", err < 1e-6,
          f"max|diff|={err:.2e}")


def check_neuralsort_fused() -> None:
    """Fused neural-sort→Sinkhorn→contract kernel vs the XLA chain, value and
    gradient, on hardware; plus the shard_map 1-device-mesh dispatch."""
    from allrank_tpu.ops.neuralsort_pallas import (
        fused_soft_sort_contract,
        soft_sort_contract,
    )
    from allrank_tpu.ops.soft_sort import (
        deterministic_neural_sort,
        sinkhorn_scaling,
    )

    rng = np.random.RandomState(2)
    B, L = 16, 240
    scores = jnp.asarray(rng.randn(B, L).astype(np.float32))
    lengths = rng.randint(30, L + 1, size=B)
    mask = jnp.asarray(np.arange(L)[None, :] >= lengths[:, None])
    vec = jnp.where(mask, 0.0,
                    jnp.asarray(np.abs(rng.randn(B, L)).astype(np.float32)))

    def xla_loss(s):
        p = sinkhorn_scaling(deterministic_neural_sort(s, 1.0, mask), mask,
                             tol=0.0, backend="xla")
        p = jnp.where(mask[:, :, None] | mask[:, None, :], 0.0, p)
        return jnp.sum(jnp.sin(jnp.einsum("nij,nj->ni", p, vec)))

    def fused_loss(s):
        return jnp.sum(jnp.sin(
            fused_soft_sort_contract(s, mask, vec, tau=1.0)))

    vx, gx = jax.jit(jax.value_and_grad(xla_loss))(scores)
    vf, gf = jax.jit(jax.value_and_grad(fused_loss))(scores)
    verr = abs(float(vx) - float(vf))
    gerr = float(jnp.max(jnp.abs(gx - gf)) / (jnp.max(jnp.abs(gx)) + 1e-12))
    check("fused neural-sort chain vs XLA (value)", verr < 1e-3,
          f"|diff|={verr:.2e}")
    check("fused neural-sort chain vs XLA (grad)", gerr < 1e-4,
          f"rel={gerr:.2e}")

    direct = np.asarray(fused_soft_sort_contract(scores, mask, vec, tau=1.0))
    mesh = make_mesh(ParallelConfig(data=1, model=1))
    with mesh:
        meshed = np.asarray(jax.jit(
            lambda s: soft_sort_contract(s, mask, vec, tau=1.0)
        )(scores))
    err = np.abs(direct - meshed).max()
    check("fused neural-sort shard_map(1-device mesh) vs direct", err == 0.0,
          f"max|diff|={err:.2e}")


def check_approx_pos_fused() -> None:
    """Fused approxNDCG rank-sum kernel vs the XLA loss chain, value and
    gradient, through the whole loss on hardware."""
    import allrank_tpu.losses.approxndcg as A
    import allrank_tpu.ops.approx_pallas as AP

    rng = np.random.RandomState(4)
    B, L = 16, 240
    y_pred = jnp.asarray(rng.randn(B, L).astype(np.float32))
    y_true = rng.randint(0, 5, size=(B, L)).astype(np.float32)
    y_true[:, -40:] = -1.0
    y_true = jnp.asarray(y_true)

    def loss(p):
        return A.approxNDCGLoss(p, y_true, alpha=1.0)

    orig = AP.approx_pos_available
    try:
        AP.approx_pos_available = lambda *a: False
        vx, gx = jax.jit(jax.value_and_grad(loss))(y_pred)
        AP.approx_pos_available = orig
        assert orig(L, B), "fused approx kernel should be available here"
        vf, gf = jax.jit(jax.value_and_grad(loss))(y_pred)
    finally:
        AP.approx_pos_available = orig
    verr = abs(float(vx) - float(vf))
    gerr = float(jnp.max(jnp.abs(gx - gf)) / (jnp.max(jnp.abs(gx)) + 1e-12))
    check("fused approxNDCG rank-sum vs XLA (value)", verr < 1e-5,
          f"|diff|={verr:.2e}")
    check("fused approxNDCG rank-sum vs XLA (grad)", gerr < 1e-4,
          f"rel={gerr:.2e}")


def check_tiled_lambda() -> None:
    """Pair-tiled lambdaLoss kernel vs the XLA chain at a WEB30K-eval shape
    (L=1308 → padded 1408, multi-tile grid on both pair axes), value and
    gradient, through the whole loss on hardware."""
    import allrank_tpu.losses.lambdaloss as LL
    import allrank_tpu.ops.lambda_pallas as LP
    import allrank_tpu.ops.lambda_tiled as LT

    rng = np.random.RandomState(7)
    B, L = 16, 1308
    y_pred = jnp.asarray(rng.randn(B, L).astype(np.float32))
    y_true = rng.randint(0, 5, size=(B, L)).astype(np.float32)
    y_true[:, -500:] = -1.0
    y_true = jnp.asarray(y_true)

    def loss(p):
        return LL.lambdaLoss(p, y_true, weighing_scheme="ndcgLoss2PP_scheme",
                             mu=10.0)

    orig = (LP.lambda_pairs_available, LT.tiled_lambda_preferred)
    try:
        LP.lambda_pairs_available = lambda *a: False
        LT.tiled_lambda_preferred = lambda *a: False
        vx, gx = jax.jit(jax.value_and_grad(loss))(y_pred)
        LT.tiled_lambda_preferred = orig[1]
        assert LT.tiled_lambda_available(L, B), (
            "tiled lambda kernel should be available here")
        LT.tiled_lambda_preferred = lambda *a: True
        vf, gf = jax.jit(jax.value_and_grad(loss))(y_pred)
    finally:
        LP.lambda_pairs_available, LT.tiled_lambda_preferred = orig
    verr = abs(float(vx) - float(vf)) / (abs(float(vx)) + 1e-12)
    gerr = float(jnp.max(jnp.abs(gx - gf)) / (jnp.max(jnp.abs(gx)) + 1e-12))
    # both paths now compute the identical log-space chain (the XLA pow
    # form drifted rel 2.4e-3 from an fp64 reference before the rewrite);
    # measured agreement at this shape/seed: value 7.2e-8, grad 3.1e-7
    check("tiled lambda L=1308 vs XLA (value)", verr < 1e-5,
          f"rel={verr:.2e}")
    check("tiled lambda L=1308 vs XLA (grad)", gerr < 1e-4,
          f"rel={gerr:.2e}")


def check_attention_mesh_dispatch() -> None:
    import allrank_tpu.models.transformer as T

    rng = np.random.RandomState(1)
    B, h, L, dk = 8, 2, 512, 32
    q, k, v = (jnp.asarray(rng.randn(B, h, L, dk).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray(np.arange(L)[None, :] >= 400).repeat(B, axis=0)
    seed = jnp.zeros((), jnp.int32)

    base = T._fused_attention_runner(L, B, 0.0)
    assert base is not None, "direct kernel runner not engaged"
    direct = np.asarray(base(q, k, v, mask, seed, 0.0))
    mesh = make_mesh(ParallelConfig(data=1, model=1))
    with mesh:
        runner = T._fused_attention_runner(L, B, 0.0)
        meshed = np.asarray(jax.jit(
            lambda q, k, v: runner(q, k, v, mask, seed, 0.0)
        )(q, k, v))
    err = np.abs(direct - meshed).max()
    check("fused attention shard_map(1-device mesh) vs direct", err < 1e-6,
          f"max|diff|={err:.2e}")


def _tiled_data(B=2, h=2, L=1400, dk=32, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, h, L, dk).astype(np.float32))
    k = jnp.asarray(rng.randn(B, h, L, dk).astype(np.float32))
    v = jnp.asarray(rng.randn(B, h, L, dk).astype(np.float32))
    mask = jnp.asarray(np.arange(L)[None, :] >= np.array([L, L - 300])[:B, None])
    return q, k, v, mask


def check_tiled_dropout() -> None:
    from allrank_tpu.ops.attention_tiled import tiled_slate_attention

    q, k, v, mask = _tiled_data()
    att = jax.jit(tiled_slate_attention, static_argnums=(5,))

    a = np.asarray(att(q, k, v, mask, jnp.int32(3), 0.4))
    b = np.asarray(att(q, k, v, mask, jnp.int32(3), 0.4))
    c = np.asarray(att(q, k, v, mask, jnp.int32(4), 0.4))
    check("tiled dropout deterministic given seed", np.array_equal(a, b))
    check("tiled dropout varies across seeds", not np.array_equal(a, c))

    # inverted-dropout mean preservation: E_seed[out] -> undropped out
    sq, sk, sv, sm = _tiled_data(B=1, h=1)
    ref = np.asarray(att(sq, sk, sv, sm, jnp.int32(0), 0.0))
    acc = np.zeros_like(ref)
    n = 48
    for s in range(n):
        acc += np.asarray(att(sq, sk, sv, sm, jnp.int32(100 + s), 0.3))
    rel = np.abs(acc / n - ref).mean() / (np.abs(ref).mean() + 1e-9)
    check("tiled dropout mean preserved (48 seeds)", rel < 0.15,
          f"rel_err={rel:.3f}")


def check_tiled_dropout_grads() -> None:
    """Extract the realized drop(P) with an identity-V probe, rebuild the
    same dropped attention in XLA, compare all three input gradients."""
    from allrank_tpu.ops.attention_tiled import tiled_slate_attention

    q, k, v, mask = _tiled_data(B=1, h=1, L=1408)  # L % dk == 0 for probes
    L, dk = q.shape[2], q.shape[3]
    seed = jnp.int32(11)
    p_drop = 0.5

    # extract drop(P) column-block by column-block: v = identity columns
    # chunked to the kernel's head dim (the keep mask depends only on seed
    # and shapes, not on v, so every probe call replays the same mask)
    att = jax.jit(tiled_slate_attention, static_argnums=(5,))
    eye = np.eye(L, dtype=np.float32)
    blocks = []
    for j0 in range(0, L, dk):
        vb = jnp.asarray(eye[:, j0 : j0 + dk][None, None])  # [1, 1, L, dk]
        blocks.append(np.asarray(att(q, k, vb, mask, seed, p_drop)))
    p_real = np.concatenate(blocks, axis=-1)  # [1, 1, L, L] = drop(P)
    keep = jnp.asarray(p_real > 0.0)

    def xla_loss(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dk)
        s = jnp.where(mask[:, None, None, :], NEG_INF_FILL, s)
        p = jax.nn.softmax(s, -1)
        p = jnp.where(keep, p / (1.0 - p_drop), 0.0)
        return jnp.sum(jnp.sin(jnp.einsum("bhqk,bhkd->bhqd", p, v)))

    def ker_loss(q, k, v):
        return jnp.sum(jnp.sin(tiled_slate_attention(q, k, v, mask, seed, p_drop)))

    gk_ = jax.jit(jax.grad(ker_loss, argnums=(0, 1, 2)))(q, k, v)
    # the kernel computes fp32 dots; hold the XLA reference to the same
    # precision (TPU default is reduced-precision matmul)
    with jax.default_matmul_precision("highest"):
        gx = jax.jit(jax.grad(xla_loss, argnums=(0, 1, 2)))(q, k, v)
    # relative criterion: residuals are hardware fp (exp/softmax path
    # divergence at L~1400); the exact-math oracle is the interpret-mode
    # deterministic-mask test in tests/ops/test_attention_tiled.py
    rels = [
        float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-12))
        for a, b in zip(gk_, gx)
    ]
    check("tiled dropout grads match XLA w/ replayed mask",
          all(e < 2e-2 for e in rels),
          f"rel dq/dk/dv = {rels[0]:.2e}/{rels[1]:.2e}/{rels[2]:.2e}")


def check_mega_sublayers() -> None:
    """Attention + FFN megakernels on hardware: value/grad parity vs the
    XLA path at p=0, dropout determinism + mean preservation."""
    import allrank_tpu.models.transformer as T
    from allrank_tpu.models.factory import init_params

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _flagship_mdef

    B, L = 64, 240
    mdef = _flagship_mdef(136)
    tdef = mdef.transformer
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        init_params(jax.random.PRNGKey(0), mdef)["transformer"],
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, tdef.d_model), dtype=jnp.bfloat16)
    mask = jnp.asarray(np.arange(L)[None, :] >= int(L * 0.85)).repeat(B, 0)
    idx = jnp.ones((B, L), jnp.int32)

    def loss(tp, xx):
        out = T.transformer_apply(tp, tdef, xx, mask, idx, train=True,
                                  rng=None)
        # nonlinear reduction: a plain sum of the final-LN output is ~0 by
        # construction and makes relative comparisons meaningless
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    def fwd_out(tp, xx):
        return T.transformer_apply(tp, tdef, xx, mask, idx, train=True,
                                   rng=None).astype(jnp.float32)

    assert T._mega_sublayer_runner(L, B, tdef) is not None, \
        "megakernel did not dispatch at the flagship shape"
    out_k = np.asarray(jax.jit(fwd_out)(params, x))
    g_k = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)

    saved = (T._mega_sublayer_runner, T._mega_ffn_runner)
    try:
        T._mega_sublayer_runner = lambda *a, **k: None
        T._mega_ffn_runner = lambda *a, **k: None
        jax.clear_caches()
        out_x = np.asarray(jax.jit(fwd_out)(params, x))
        g_x = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
    finally:
        T._mega_sublayer_runner, T._mega_ffn_runner = saved
        jax.clear_caches()

    rel_v = float(np.abs(out_k - out_x).max() / (np.abs(out_x).max() + 1e-9))
    rels = [
        float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()
              / (jnp.abs(b.astype(jnp.float32)).max() + 1e-12))
        for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_x))
    ]
    check("mega sublayers value matches XLA (bf16)", rel_v < 2e-2,
          f"rel={rel_v:.2e}")
    check("mega sublayers grads match XLA (bf16)",
          all(e < 6e-2 for e in rels), f"max rel={max(rels):.2e}")

    # dropout: deterministic given rng key, varies across keys, mean-preserving
    def fwd(key):
        return T.transformer_apply(params, tdef, x[:8], mask[:8], idx[:8],
                                   train=True, rng=key)

    tdef_drop = T.TransformerDef(
        N=1, d_model=tdef.d_model, d_ff=tdef.d_ff, h=tdef.h, dropout=0.3,
        positional_encoding=None,
    )

    def fwd_drop(key):
        return T.transformer_apply(
            {"layers": params["layers"][:1], "final_ln": params["final_ln"]},
            tdef_drop, x[:64], mask[:64], idx[:64], train=True, rng=key,
        )

    jf = jax.jit(fwd_drop)
    a = np.asarray(jf(jax.random.PRNGKey(5)), dtype=np.float32)
    b = np.asarray(jf(jax.random.PRNGKey(5)), dtype=np.float32)
    c = np.asarray(jf(jax.random.PRNGKey(6)), dtype=np.float32)
    check("mega dropout deterministic given key", np.array_equal(a, b))
    check("mega dropout varies across keys", not np.array_equal(a, c))

    ref = np.asarray(
        jax.jit(lambda: T.transformer_apply(
            {"layers": params["layers"][:1], "final_ln": params["final_ln"]},
            tdef_drop, x[:64], mask[:64], idx[:64], train=False,
        ))(), dtype=np.float32)
    acc = np.zeros_like(ref)
    n = 32
    for s in range(n):
        acc += np.asarray(jf(jax.random.PRNGKey(100 + s)), dtype=np.float32)
    rel = np.abs(acc / n - ref).mean() / (np.abs(ref).mean() + 1e-9)
    check("mega dropout mean preserved (32 keys)", rel < 0.2,
          f"rel_err={rel:.3f}")



def check_encoder_seed_grid() -> None:
    """Whole-encoder megakernel (ops/encoder_block.py): numeric checks WITH
    THE REAL PRNG at a shape where the chained-attention and encoder
    batch-block formulas diverge (fwd once used the former, bwd the latter —
    different slate->program mapping = different per-program seed mix =
    corrupt grads). Interpret mode cannot see this (seed-independent PRNG
    stub).

    NOTE a directional finite difference is NOT a sound probe here (round-4
    finding): TPU fp32 matmuls quantize their inputs to bf16 on the MXU, so
    the forward is a step function at bf16-ulp scale in x — measured: the
    pure-XLA composition on this chip jumps by the IDENTICAL 1.3e-2 under a
    1e-4 perturbation while the same math on CPU is smooth (gain ~0.1).
    FD therefore measures quantization steps amplified by 1/2eps, not mask
    replay. The battery below is hardware-sound: bitwise determinism of
    forward AND grad (PRNG state leakage), p_drop=0 grad parity vs the XLA
    composition on-chip (backward math), and dropout mean preservation over
    seeds (mask/scale). The fwd==bwd seed-mix contract itself is pinned
    structurally (tests/ops/test_mega_blocks.py same-grid spy) plus by the
    sublayer-level replayed-mask checks above."""
    from allrank_tpu.ops import attention_block, encoder_block
    from allrank_tpu.ops.attention_block import (_layer_norm,
                                                 attn_sublayer_fwd_vmem)
    from allrank_tpu.ops.encoder_block import encoder_forward
    from allrank_tpu.ops.ffn_block import ffn_sublayer_fwd_vmem

    B, L, D, DFF, N, H = 8, 384, 64, 512, 2, 2
    a_bb = attention_block._batch_block(B, L)
    e_bb = encoder_block._batch_block(B, L, D, DFF, N, 4)
    check("encoder seed-grid: shape IS divergent", a_bb != e_bb,
          f"attn_bb={a_bb} enc_bb={e_bb}")

    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(B, L, D).astype(np.float32))
    key_mask = jnp.asarray(
        np.arange(L)[None, :] >= rs.randint(L // 2, L + 1, size=(B, 1)))
    seeds = jnp.asarray(rs.randint(0, 2**31 - 1, size=4 * N), jnp.int32)
    sc = 0.2
    ws = (
        jnp.ones((N, D), jnp.float32), jnp.zeros((N, D), jnp.float32),
        jnp.asarray(sc * rs.randn(N, D, 3 * D), jnp.float32),
        jnp.zeros((N, 3 * D), jnp.float32),
        jnp.asarray(sc * rs.randn(N, D, D), jnp.float32),
        jnp.zeros((N, D), jnp.float32),
        jnp.ones((N, D), jnp.float32), jnp.zeros((N, D), jnp.float32),
        jnp.asarray(sc * rs.randn(N, D, DFF), jnp.float32),
        jnp.zeros((N, DFF), jnp.float32),
        jnp.asarray(sc * rs.randn(N, DFF, D), jnp.float32),
        jnp.zeros((N, D), jnp.float32),
    )
    fs, fb = jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32)
    readout = jnp.asarray(rs.randn(B, L, D).astype(np.float32))

    def f(xx, sd):
        out = encoder_forward(xx, key_mask, sd, ws, fs, fb,
                              h=H, p_drop=0.25)
        return jnp.sum(out * readout)

    jf = jax.jit(f)
    jg = jax.jit(jax.grad(f))
    # the real PRNG must respond to seeds at all (interpret mode does not)
    v1, v2 = float(jf(x, seeds)), float(jf(x, seeds + 12345))
    check("encoder kernel dropout varies across seeds", v1 != v2,
          f"|df|={abs(v1 - v2):.3g}")

    # bitwise determinism of forward and grad: same (x, seeds) -> same masks,
    # same values — catches PRNG state leaking across calls/iterations
    det_f = all(float(jf(x, seeds)) == v1 for _ in range(3))
    g = jg(x, seeds)
    det_g = all(
        float(jnp.max(jnp.abs(jg(x, seeds) - g))) == 0.0 for _ in range(2)
    )
    check("encoder kernel fwd+grad deterministic given seeds", det_f and det_g)

    # p_drop=0 backward parity vs the pure-XLA composition ON THIS CHIP
    # (same bf16-MXU arithmetic class, independent op schedule)
    def xla_fwd(xx):
        padded = key_mask.astype(jnp.float32)
        for blk in range(N):
            xx = attn_sublayer_fwd_vmem(
                xx, padded, ws[0][blk], ws[1][blk], ws[2][blk], ws[3][blk],
                ws[4][blk], ws[5][blk], 0, 0,
                h=H, dk=D // H, p_attn=0.0, p_resid=0.0)
            xx = ffn_sublayer_fwd_vmem(
                xx, ws[6][blk], ws[7][blk], ws[8][blk], ws[9][blk],
                ws[10][blk], ws[11][blk], 0, 0, p_hidden=0.0, p_resid=0.0)
        out, _, _, _, _ = _layer_norm(xx.astype(jnp.float32), fs, fb, D)
        return jnp.sum(out.astype(xx.dtype) * readout)

    def f0(xx, sd):
        out = encoder_forward(xx, key_mask, sd, ws, fs, fb, h=H, p_drop=0.0)
        return jnp.sum(out * readout)

    gk = np.asarray(jax.jit(jax.grad(f0))(x, seeds), dtype=np.float64)
    gx = np.asarray(jax.jit(jax.grad(xla_fwd))(x), dtype=np.float64)
    cos = float((gk * gx).sum() /
                (np.linalg.norm(gk) * np.linalg.norm(gx) + 1e-30))
    nrm = float(np.linalg.norm(gk - gx) / (np.linalg.norm(gx) + 1e-30))
    check("encoder kernel p=0 grad matches XLA on-chip",
          cos > 0.999 and nrm < 5e-2, f"cos={cos:.6f} relnorm={nrm:.2e}")

    # dropout mean preservation: E_seeds[out(p=0.25)] ~ out(p=0)
    base = float(jax.jit(f0)(x, seeds))
    draws = [float(jf(x, seeds + 7919 * i)) for i in range(24)]
    mean = float(np.mean(draws))
    sem = float(np.std(draws) / np.sqrt(len(draws)))
    check("encoder kernel dropout mean preserved (24 seeds)",
          abs(mean - base) < max(6 * sem, 0.05 * abs(base)),
          f"mean={mean:.4f} base={base:.4f} sem={sem:.3g}")


def check_int8_scorer() -> None:
    """The w8a8 quantized scorer on hardware (int8 MXU matmuls + the
    kernel-routed bf16 attention core) must track the fp32 scorer at the
    flagship serve shape — regression guard for the opt-in serving mode."""
    import numpy as onp

    from allrank_tpu.config import (FCConfig, ModelConfig,
                                    PositionalEncodingConfig,
                                    PostModelConfig, TransformerConfig)
    from allrank_tpu.models.factory import init_params, make_model
    from allrank_tpu.serving import make_scorer

    L, F = 240, 136
    mdef = make_model(ModelConfig(
        fc_model=FCConfig(sizes=[128], input_norm=True, activation="ReLU",
                          dropout=None),
        transformer=TransformerConfig(
            N=4, d_ff=512, h=4, dropout=0.0,
            positional_encoding=PositionalEncodingConfig(
                strategy="fixed", max_indices=L + 1)),
        post_model=PostModelConfig(d_output=1)), F)
    params = init_params(jax.random.PRNGKey(0), mdef)
    rng = onp.random.RandomState(0)
    x = rng.randn(64, L, F).astype(onp.float32)
    lengths = rng.randint(L // 2, L + 1, size=64).astype(onp.int32)
    ref = onp.asarray(make_scorer(params, mdef)(x, lengths))
    got = onp.asarray(make_scorer(params, mdef, quantize="int8")(x, lengths))
    same_pad = bool(onp.array_equal(onp.isneginf(got), onp.isneginf(ref)))
    fin = onp.isfinite(ref)
    corr = float(onp.corrcoef(ref[fin], got[fin])[0, 1])
    # top-1 agreement per slate (what serving cares about)
    top_match = float(onp.mean(onp.argmax(got, axis=1)
                               == onp.argmax(ref, axis=1)))
    check("int8 scorer tracks fp32 on hardware",
          same_pad and corr > 0.998 and top_match > 0.9,
          f"corr={corr:.5f} top1={top_match:.2f}")

    # the production static mode: calibrated activation scales + bf16
    # elementwise flow (round 5) — same gates
    from allrank_tpu.quant import calibrate_activations

    scales = calibrate_activations(params, mdef, [(x, lengths)])
    got_s = onp.asarray(make_scorer(
        params, mdef, compute_dtype="bfloat16", quantize="int8_static",
        act_scales=scales)(x, lengths))
    same_pad_s = bool(onp.array_equal(onp.isneginf(got_s), onp.isneginf(ref)))
    corr_s = float(onp.corrcoef(ref[fin], got_s[fin])[0, 1])
    top_s = float(onp.mean(onp.argmax(got_s, axis=1)
                           == onp.argmax(ref, axis=1)))
    check("int8_static (bf16 flow) scorer tracks fp32 on hardware",
          same_pad_s and corr_s > 0.998 and top_s > 0.9,
          f"corr={corr_s:.5f} top1={top_s:.2f}")



def main() -> int:
    print("device:", jax.devices()[0], "backend:", jax.default_backend())
    if jax.default_backend() != "tpu":
        print("not a TPU backend — nothing to check")
        return 1
    check_sinkhorn_mesh_dispatch()
    check_neuralsort_fused()
    check_approx_pos_fused()
    check_tiled_lambda()
    check_attention_mesh_dispatch()
    check_tiled_dropout()
    check_tiled_dropout_grads()
    check_mega_sublayers()
    check_encoder_seed_grid()
    check_int8_scorer()
    if FAILURES:
        print("FAILURES:", FAILURES)
        return 1
    print("all hardware kernel checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
