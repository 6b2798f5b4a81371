"""Megakernel sublayers (ops/attention_block.py, ops/ffn_block.py):
transformer-level equivalence with the XLA path, shard_map mesh parity,
and the dispatch policy gates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

import allrank_tpu.models.transformer as T
from allrank_tpu.config import ParallelConfig
from allrank_tpu.models.transformer import TransformerDef, transformer_init
from allrank_tpu.ops.attention_block import attention_sublayer
from allrank_tpu.ops.ffn_block import ffn_sublayer
from allrank_tpu.parallel import make_mesh


def _tdef(**kw):
    base = dict(N=2, d_model=32, d_ff=64, h=2, dropout=0.0,
                positional_encoding=None)
    base.update(kw)
    return TransformerDef(**base)


def _setup(B=8, L=48, seed=0):
    tdef = _tdef()
    rng = np.random.RandomState(seed)
    params = transformer_init(jax.random.PRNGKey(0), tdef)
    x = jnp.asarray(rng.randn(B, L, tdef.d_model).astype(np.float32))
    mask = jnp.asarray(
        np.arange(L)[None, :] >= rng.randint(L // 2, L + 1, size=(B, 1))
    )
    idx = jnp.ones((B, L), jnp.int32)
    return tdef, params, x, mask, idx


def _force_kernels(monkeypatch, encoder: bool):
    """Force megakernel dispatch on the CPU test backend; encoder=False
    pins the per-sublayer kernels (the whole-encoder kernel otherwise
    takes precedence)."""
    from allrank_tpu.ops import autotune

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(T, "MEGA_SUBLAYER_MIN_LEN", 0)
    # the gates read through the autotune table (transformer._min_groups)
    monkeypatch.setitem(autotune.DEFAULTS, "fused_attention_min_groups", 0)
    monkeypatch.setattr(T, "MEGA_ENCODER_ENABLED", encoder)


class TestTransformerEquivalence:
    @pytest.mark.parametrize("encoder", [False, True],
                             ids=["sublayer-kernels", "encoder-kernel"])
    def test_forced_megakernels_match_xla_path(self, monkeypatch, encoder):
        tdef, params, x, mask, idx = _setup()
        ref = T.transformer_apply(params, tdef, x, mask, idx, train=False)

        _force_kernels(monkeypatch, encoder)
        with pltpu.force_tpu_interpret_mode():
            out = T.transformer_apply(params, tdef, x, mask, idx, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    @pytest.mark.parametrize("encoder", [False, True],
                             ids=["sublayer-kernels", "encoder-kernel"])
    def test_forced_megakernels_match_xla_grads(self, monkeypatch, encoder):
        tdef, params, x, mask, idx = _setup()

        def loss(p, xx):
            out = T.transformer_apply(p, tdef, xx, mask, idx, train=True,
                                      rng=None)
            return jnp.sum(jnp.sin(out))

        g_ref = jax.grad(loss, argnums=(0, 1))(params, x)

        _force_kernels(monkeypatch, encoder)
        with pltpu.force_tpu_interpret_mode():
            g_ker = jax.grad(loss, argnums=(0, 1))(params, x)
        for a, b in zip(jax.tree.leaves(g_ker), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)

    def test_encoder_kernel_matches_sublayer_kernels_with_dropout(
            self, monkeypatch):
        """With dropout active, the whole-encoder kernel must replay the
        exact same per-(block, stream, program) draws as the chained
        sublayer kernels — same seeds derivation, same PRNG discipline."""
        tdef, params, x, mask, idx = _setup()
        tdef = _tdef(dropout=0.25)
        rng = jax.random.PRNGKey(7)

        def loss(p, xx, enc_on):
            monkeypatch.setattr(T, "MEGA_ENCODER_ENABLED", enc_on)
            out = T.transformer_apply(p, tdef, xx, mask, idx, train=True,
                                      rng=rng)
            return jnp.sum(jnp.sin(out)), out

        _force_kernels(monkeypatch, True)
        with pltpu.force_tpu_interpret_mode():
            (l_enc, out_enc), g_enc = jax.value_and_grad(
                loss, argnums=0, has_aux=True)(params, x, True)
            (l_sub, out_sub), g_sub = jax.value_and_grad(
                loss, argnums=0, has_aux=True)(params, x, False)
        np.testing.assert_allclose(np.asarray(out_enc), np.asarray(out_sub),
                                   atol=2e-5)
        for a, b in zip(jax.tree.leaves(g_enc), jax.tree.leaves(g_sub)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)


class TestMeshParity:
    def test_attention_sublayer_sharded_matches_direct(self):
        tdef, params, x, mask, idx = _setup(B=8)
        lp = params["layers"][0]
        seeds = jnp.zeros((2,), jnp.int32)
        args = (lp["ln1"]["scale"], lp["ln1"]["bias"], lp["qkv"]["w"],
                lp["qkv"]["b"], lp["out"]["w"], lp["out"]["b"])
        mesh = make_mesh(ParallelConfig(data=4, model=1))
        with pltpu.force_tpu_interpret_mode():
            direct = attention_sublayer(x, mask, *args, seeds, tdef.h,
                                        0.0, 0.0)
            with mesh:
                sharded = jax.jit(jax.shard_map(
                    lambda xx, m, *w: attention_sublayer(
                        xx, m, *w, seeds, tdef.h, 0.0, 0.0),
                    mesh=mesh,
                    in_specs=(P("data"), P("data")) + (P(),) * 6,
                    out_specs=P("data"), check_vma=False,
                ))(x, mask, *args)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(direct),
                                   atol=1e-5)

    def test_ffn_sublayer_sharded_matches_direct(self):
        tdef, params, x, mask, idx = _setup(B=8)
        lp = params["layers"][0]
        seeds = jnp.zeros((2,), jnp.int32)
        args = (lp["ln2"]["scale"], lp["ln2"]["bias"], lp["ff1"]["w"],
                lp["ff1"]["b"], lp["ff2"]["w"], lp["ff2"]["b"])
        mesh = make_mesh(ParallelConfig(data=4, model=1))
        with pltpu.force_tpu_interpret_mode():
            direct = ffn_sublayer(x, *args, seeds, 0.0, 0.0)
            with mesh:
                sharded = jax.jit(jax.shard_map(
                    lambda xx, *w: ffn_sublayer(xx, *w, seeds, 0.0, 0.0),
                    mesh=mesh,
                    in_specs=(P("data"),) + (P(),) * 6,
                    out_specs=P("data"), check_vma=False,
                ))(x, *args)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(direct),
                                   atol=1e-5)


class TestDispatchPolicy:
    def test_cpu_backend_never_dispatches(self):
        assert T._mega_sublayer_runner(240, 64, _tdef()) is None
        assert T._mega_ffn_runner(240, 64, _tdef()) is None

    def test_window_and_batch_gates(self, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(jax, "device_count", lambda: 1)
        tdef = _tdef(h=4, d_model=128, d_ff=512)
        assert T._mega_sublayer_runner(240, 64, tdef) is not None
        assert T._mega_ffn_runner(240, 64, tdef) is not None
        # below the length window
        assert T._mega_sublayer_runner(64, 64, tdef) is None
        # above the compile-verified VMEM envelope
        assert T._mega_sublayer_runner(1024, 64, tdef) is None
        # too few slate-head rows: XLA wins there (measured)
        assert T._mega_sublayer_runner(240, 8, tdef) is None
        # width outside the envelope
        wide = _tdef(h=4, d_model=512, d_ff=2048)
        assert T._mega_sublayer_runner(240, 64, wide) is None

    def test_kernel_beats_xla_policy(self):
        bf16, f32 = jnp.bfloat16, jnp.float32
        # legacy unconditional window
        assert T._kernel_beats_xla(512, 8, 4, f32)
        # bf16 window needs enough slate-head rows
        assert T._kernel_beats_xla(240, 64, 4, bf16)
        assert not T._kernel_beats_xla(240, 16, 4, bf16)
        assert not T._kernel_beats_xla(240, 64, 4, f32)
        assert not T._kernel_beats_xla(64, 64, 4, bf16)


class TestEncoderKernelDropoutReplay:
    """Regression: the whole-encoder kernel seeds dropout per
    (block, stream, program), so forward and backward MUST agree on the
    slates-per-program batch block. They once used different formulas
    (the chained attention kernel's in fwd, the encoder's VMEM-bound one
    in bwd), which silently replayed different masks — i.e. corrupt
    gradients — at any shape where the formulas diverge.

    NOTE the bug is INVISIBLE to interpret-mode numerics: the interpreter's
    pltpu PRNG produces the same bits regardless of seed (measured:
    max|out(seed1) - out(seed2)| == 0.0 with dropout active), so the
    per-program seed mix has no effect on CPU. These tests therefore pin
    the STRUCTURAL contract (identical fwd/bwd grids); the numeric proof
    with the real on-core PRNG lives in tools/tpu_kernel_checks.py
    (encoder-kernel FD check at this exact divergent shape)."""

    # L-heavy shape chosen so the two block formulas DIVERGE (4 vs 2)
    # while the backward still fits scoped VMEM (d_ff-heavy shapes OOM)
    B, L, D, DFF, N, H = 8, 384, 64, 512, 2, 2

    def test_premise_block_formulas_diverge(self):
        from allrank_tpu.ops import attention_block, encoder_block

        attn_bb = attention_block._batch_block(self.B, self.L)
        enc_bb = encoder_block._batch_block(self.B, self.L, self.D,
                                            self.DFF, self.N, 4)
        assert attn_bb != enc_bb, (
            "test shape no longer exercises the divergent regime "
            f"(attn {attn_bb} == encoder {enc_bb}); pick a new shape")

    def test_fwd_and_bwd_use_one_grid_at_divergent_shape(self, monkeypatch):
        """Spy on pallas_call and assert the forward and backward kernels
        launch with the SAME grid (hence the same slate->program mapping
        and the same per-program seed mix)."""
        import jax.experimental.pallas as pl_mod

        from allrank_tpu.ops import encoder_block
        from allrank_tpu.ops.encoder_block import encoder_forward

        B, L, D, DFF, N, H = self.B, self.L, self.D, self.DFF, self.N, self.H
        # fresh trace per run: the enc closure is lru-cached but re-traces
        # (and re-invokes pallas_call) on every un-jitted call, so the spy
        # sees both directions
        grids = []
        orig = pl_mod.pallas_call

        def spy(kernel, *a, **kw):
            gs = kw.get("grid_spec")
            if gs is not None:
                grids.append(tuple(gs.grid))
            return orig(kernel, *a, **kw)

        monkeypatch.setattr(encoder_block.pl, "pallas_call", spy)

        rs = np.random.RandomState(11)
        x = jnp.asarray(rs.randn(B, L, D).astype(np.float32))
        key_mask = jnp.asarray(
            np.arange(L)[None, :] >= rs.randint(L // 2, L + 1, size=(B, 1)))
        seeds = jnp.asarray(rs.randint(0, 2**31 - 1, size=4 * N), jnp.int32)
        sc = 0.2
        ws = (
            jnp.ones((N, D), jnp.float32),
            jnp.zeros((N, D), jnp.float32),
            jnp.asarray(sc * rs.randn(N, D, 3 * D), jnp.float32),
            jnp.zeros((N, 3 * D), jnp.float32),
            jnp.asarray(sc * rs.randn(N, D, D), jnp.float32),
            jnp.zeros((N, D), jnp.float32),
            jnp.ones((N, D), jnp.float32),
            jnp.zeros((N, D), jnp.float32),
            jnp.asarray(sc * rs.randn(N, D, DFF), jnp.float32),
            jnp.zeros((N, DFF), jnp.float32),
            jnp.asarray(sc * rs.randn(N, DFF, D), jnp.float32),
            jnp.zeros((N, D), jnp.float32),
        )
        fs, fb = jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32)

        def f(xx):
            out = encoder_forward(xx, key_mask, seeds, ws, fs, fb,
                                  h=H, p_drop=0.25)
            return jnp.sum(out)

        with pltpu.force_tpu_interpret_mode():
            jax.grad(f)(x)

        # custom_vjp fwd + bwd = (at least) two launches, all same grid
        assert len(grids) >= 2, grids
        assert len(set(grids)) == 1, (
            f"forward/backward grids diverge: {grids} — the per-program "
            "dropout seed mix no longer matches between directions")
