"""Serving path: scorer/ranker semantics + export round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from allrank_tpu.config import FCConfig, ModelConfig, PostModelConfig
from allrank_tpu.models.factory import init_params, make_model
from allrank_tpu.serving import (
    export_scorer,
    load_scorer,
    make_ranker,
    make_scorer,
)


def _model(F=6):
    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[8], input_norm=False, activation="ReLU",
                              dropout=None),
            transformer=None,
            post_model=PostModelConfig(d_output=1),
        ), F,
    )
    return mdef, init_params(jax.random.PRNGKey(0), mdef)


def test_scorer_masks_padded_positions():
    mdef, params = _model()
    scorer = make_scorer(params, mdef)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 5, 6).astype(np.float32))
    lengths = jnp.asarray([5, 3, 1], dtype=jnp.int32)
    s = np.asarray(scorer(x, lengths))
    assert np.isfinite(s[0]).all()
    assert np.isneginf(s[1, 3:]).all() and np.isfinite(s[1, :3]).all()
    assert np.isneginf(s[2, 1:]).all()


def test_ranker_orders_by_score_with_padding_last():
    mdef, params = _model()
    scorer, ranker = make_scorer(params, mdef), make_ranker(params, mdef)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 6, 6).astype(np.float32))
    lengths = jnp.asarray([6, 4], dtype=jnp.int32)
    s = np.asarray(scorer(x, lengths))
    order = np.asarray(ranker(x, lengths))
    for b in range(2):
        n = int(lengths[b])
        assert sorted(order[b].tolist()) == list(range(6))
        ranked_scores = s[b][order[b][:n]]
        assert (np.diff(ranked_scores) <= 1e-6).all()  # descending
        assert set(order[b][n:].tolist()) == set(range(n, 6))  # padding last


def test_bf16_scorer_tracks_fp32_and_keeps_padding_semantics():
    mdef, params = _model()
    s32 = make_scorer(params, mdef)
    s16 = make_scorer(params, mdef, compute_dtype="bfloat16")
    x = jnp.asarray(np.random.RandomState(3).randn(4, 7, 6).astype(np.float32))
    lengths = jnp.asarray([7, 5, 2, 7], dtype=jnp.int32)
    a, b = np.asarray(s32(x, lengths)), np.asarray(s16(x, lengths))
    assert b.dtype == np.float32
    valid = ~np.isneginf(a)
    assert (np.isneginf(b) == np.isneginf(a)).all()
    np.testing.assert_allclose(a[valid], b[valid], rtol=0.05, atol=0.05)


def test_aot_compile_matches_jit_and_reports_info():
    from allrank_tpu.serving import aot_compile

    mdef, params = _model()
    scorer = make_scorer(params, mdef)
    compiled, info = aot_compile(scorer, batch_size=3, slate_length=5,
                                 n_features=6)
    x = jnp.asarray(np.random.RandomState(4).randn(3, 5, 6).astype(np.float32))
    lengths = jnp.asarray([5, 4, 1], dtype=jnp.int32)
    np.testing.assert_allclose(np.asarray(compiled(x, lengths)),
                               np.asarray(scorer(x, lengths)), rtol=1e-6)
    assert isinstance(info, dict)  # analysis keys are backend-best-effort


def test_sharded_scorer_matches_single_device():
    from allrank_tpu.config import (
        ParallelConfig,
        PositionalEncodingConfig,
        TransformerConfig,
    )
    from allrank_tpu.parallel.mesh import make_mesh
    from allrank_tpu.serving import make_sharded_scorer

    F = 6
    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[16], input_norm=False, activation="ReLU",
                              dropout=None),
            transformer=TransformerConfig(
                N=1, d_ff=32, h=2,
                positional_encoding=PositionalEncodingConfig(
                    strategy="fixed", max_indices=16),
                dropout=0.0),
            post_model=PostModelConfig(d_output=1),
        ), F,
    )
    params = init_params(jax.random.PRNGKey(0), mdef)
    x = jnp.asarray(np.random.RandomState(5).randn(8, 5, F).astype(np.float32))
    lengths = jnp.asarray([5, 3, 1, 5, 4, 2, 5, 5], dtype=jnp.int32)
    ref = np.asarray(make_scorer(params, mdef)(x, lengths))

    for pcfg in (ParallelConfig(data=-1, model=1),    # 8-way DP
                 ParallelConfig(data=4, model=2)):    # DP x TP
        mesh = make_mesh(pcfg)
        sharded = make_sharded_scorer(params, mdef, mesh)
        got = np.asarray(sharded(x, lengths))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    import pytest
    with pytest.raises(ValueError):
        make_sharded_scorer(params, mdef, make_mesh(ParallelConfig()))(
            x[:3], lengths[:3])


def test_export_roundtrip(tmp_path):
    mdef, params = _model()
    scorer = make_scorer(params, mdef)
    path = export_scorer(params, mdef, slate_length=5, n_features=6,
                         path=str(tmp_path / "scorer.hlo"), batch_size=3)
    loaded = load_scorer(path)
    x = jnp.asarray(np.random.RandomState(2).randn(3, 5, 6).astype(np.float32))
    lengths = jnp.asarray([5, 2, 4], dtype=jnp.int32)
    np.testing.assert_allclose(
        np.asarray(loaded(x, lengths)), np.asarray(scorer(x, lengths)),
        rtol=1e-6,
    )
