"""int8 quantized serving (quant.py): exactness on representable values,
degenerate-input guards, fidelity to the fp32 tower, and the serving API
seams (beyond-reference — the torch reference is fp32-only end-to-end)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from allrank_tpu.config import (
    FCConfig,
    ModelConfig,
    ParallelConfig,
    PositionalEncodingConfig,
    PostModelConfig,
    TransformerConfig,
)
from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.metrics import ndcg
from allrank_tpu.models.factory import init_params, make_model, score
from allrank_tpu.quant import (
    calibrate_activations,
    q_dense_apply,
    quantize_dense,
    quantize_model,
    quantized_bytes,
    quantized_score,
)
from allrank_tpu.serving import make_ranker, make_scorer, make_sharded_scorer


def _full_model(F=8, d_output=1, seed=0):
    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[16, 8], input_norm=True,
                              activation="ReLU", dropout=None),
            transformer=TransformerConfig(
                N=2, d_ff=16, h=2, dropout=0.0,
                positional_encoding=PositionalEncodingConfig(
                    strategy="fixed", max_indices=60),
            ),
            post_model=PostModelConfig(d_output=d_output),
        ), F,
    )
    return mdef, init_params(jax.random.PRNGKey(seed), mdef)


def test_q_dense_exact_on_representable_values():
    # weights and activations that are exactly int8-representable after
    # scaling -> the quantized matmul must equal the fp32 matmul exactly
    rng = np.random.RandomState(0)
    w = (rng.randint(-127, 128, size=(6, 4)) * 0.03).astype(np.float32)
    w[np.abs(w).argmax(axis=0), np.arange(4)] = 127 * 0.03  # pin col absmax
    b = rng.randn(4).astype(np.float32)
    x = (rng.randint(-127, 128, size=(3, 6)) * 0.125).astype(np.float32)
    x[np.arange(3), np.abs(x).argmax(axis=1)] = 127 * 0.125  # pin row absmax
    qp = quantize_dense({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    got = np.asarray(q_dense_apply(qp, jnp.asarray(x)))
    np.testing.assert_allclose(got, x @ w + b, rtol=1e-6, atol=1e-6)


def test_q_dense_zero_rows_and_zero_columns_are_finite():
    qp = quantize_dense({"w": jnp.zeros((5, 3)), "b": jnp.asarray([1.0, -2.0, 0.5])})
    out = np.asarray(q_dense_apply(qp, jnp.zeros((2, 5))))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, np.tile([1.0, -2.0, 0.5], (2, 1)))


def test_q_dense_tracks_fp32_within_w8a8_error():
    rng = np.random.RandomState(1)
    w = rng.randn(32, 24).astype(np.float32)
    b = rng.randn(24).astype(np.float32)
    x = rng.randn(10, 32).astype(np.float32)
    qp = quantize_dense({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    got = np.asarray(q_dense_apply(qp, jnp.asarray(x)))
    ref = x @ w + b
    denom = np.linalg.norm(ref - b)  # compare the matmul part, not the bias
    assert np.linalg.norm(got - ref) / denom < 0.02


def test_quantized_score_tracks_fp32_tower():
    mdef, params = _full_model()
    q = quantize_model(params, mdef)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 12, 8).astype(np.float32))
    mask = jnp.asarray(rng.rand(4, 12) > 0.8)
    mask = mask.at[:, 0].set(False)  # at least one real doc per slate
    indices = jnp.ones((4, 12), dtype=jnp.int32)
    ref = np.asarray(score(params, mdef, x, mask, indices, train=False))
    got = np.asarray(quantized_score(q, mdef, x, mask, indices))
    # per-layer dynamic dequantization keeps the tower close to fp32
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.999
    assert np.abs(got - ref).max() < 0.05 * max(1.0, np.abs(ref).max())


def test_quantized_score_multi_output_head_sums_like_fp32():
    mdef, params = _full_model(d_output=3, seed=3)
    q = quantize_model(params, mdef)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 9, 8).astype(np.float32))
    mask = jnp.zeros((2, 9), dtype=bool)
    indices = jnp.ones((2, 9), dtype=jnp.int32)
    ref = np.asarray(score(params, mdef, x, mask, indices, train=False))
    got = np.asarray(quantized_score(q, mdef, x, mask, indices))
    assert got.shape == ref.shape == (2, 9)
    assert np.corrcoef(ref.ravel(), got.ravel())[0, 1] > 0.999


def test_int8_scorer_api_masking_and_ranking_quality():
    mdef, params = _full_model(seed=5)
    s32 = make_scorer(params, mdef)
    s8 = make_scorer(params, mdef, quantize="int8")
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(6, 10, 8).astype(np.float32))
    lengths = jnp.asarray([10, 7, 3, 10, 1, 5], dtype=jnp.int32)
    ref = np.asarray(s32(x, lengths))
    got = np.asarray(s8(x, lengths))
    # identical -inf padding semantics
    np.testing.assert_array_equal(np.isneginf(got), np.isneginf(ref))
    # ranking fidelity: treat fp32 scores as graded relevance and check the
    # int8 ordering preserves the fp32 ordering's ndcg@5 to within 1%
    finite = ~np.isneginf(ref)
    rel = np.where(finite, ref - ref[finite].min() + 0.01,
                   float(PADDED_Y_VALUE)).astype(np.float32)
    n_ref = float(jnp.mean(ndcg(jnp.asarray(ref), jnp.asarray(rel), ats=(5,))))
    n_got = float(jnp.mean(ndcg(jnp.asarray(got), jnp.asarray(rel), ats=(5,))))
    assert n_got > 0.99 * n_ref

    order8 = np.asarray(make_ranker(params, mdef, quantize="int8")(x, lengths))
    for b in range(6):
        assert sorted(order8[b].tolist()) == list(range(10))


def test_int8_sharded_scorer_matches_single_device_int8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from allrank_tpu.parallel.mesh import make_mesh

    mdef, params = _full_model(seed=7)
    mesh = make_mesh(ParallelConfig(data=8))
    sharded = make_sharded_scorer(params, mdef, mesh, quantize="int8")
    single = make_scorer(params, mdef, quantize="int8")
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(16, 10, 8).astype(np.float32))
    lengths = jnp.asarray(rng.randint(1, 11, size=16), dtype=jnp.int32)
    np.testing.assert_allclose(np.asarray(sharded(x, lengths)),
                               np.asarray(single(x, lengths)),
                               rtol=1e-5, atol=1e-5)


def test_quantized_bytes_is_4x_smaller_on_matmul_weights():
    # a serving-realistic tower (matmul weights dominate the PE/LN floats)
    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[128, 128], input_norm=True,
                              activation="ReLU", dropout=None),
            transformer=TransformerConfig(
                N=2, d_ff=256, h=4, dropout=0.0,
                positional_encoding=PositionalEncodingConfig(
                    strategy="fixed", max_indices=60),
            ),
            post_model=PostModelConfig(d_output=1),
        ), 32,
    )
    params = init_params(jax.random.PRNGKey(9), mdef)
    q = quantize_model(params, mdef)
    fp32_bytes = sum(p.size * 4 for p in jax.tree.leaves(params))
    assert quantized_bytes(q) < 0.35 * fp32_bytes


def _calib_batches(F=8, n=3, seed=20):
    rng = np.random.RandomState(seed)
    return [(rng.randn(6, 10, F).astype(np.float32),
             rng.randint(1, 11, size=6).astype(np.int32)) for _ in range(n)]


def test_calibration_covers_every_quantized_site():
    mdef, params = _full_model(seed=13)
    scales = calibrate_activations(params, mdef, _calib_batches())
    # fc tower (2 layers) + 2 transformer blocks x 4 matmuls + output head
    expected = {"fc/0", "fc/1", "output"} | {
        f"t{i}/{m}" for i in range(2) for m in ("qkv", "out", "ff1", "ff2")}
    assert set(scales) == expected
    # per-input-channel vectors, strictly positive, JSON-serializable
    import json

    json.dumps(scales)
    for site, vec in scales.items():
        assert isinstance(vec, list) and all(v > 0.0 for v in vec), site
    # running absmax: calibrating on a superset can only grow scales
    more = calibrate_activations(
        params, mdef, _calib_batches() + _calib_batches(seed=21))
    for k in scales:
        assert all(a >= b for a, b in zip(more[k], scales[k])), k


def test_per_channel_migration_survives_outlier_channels():
    """The corpus-scale failure mode reproduced small: ONE input channel
    carrying 100x the magnitude of the rest must not starve the other
    channels' int8 resolution (per-tensor calibration did exactly that —
    measured 4.5 ndcg points at WEB30K scale)."""
    mdef, params = _full_model(seed=30)
    rng = np.random.RandomState(31)
    batches = []
    for _ in range(3):
        x = rng.randn(6, 10, 8).astype(np.float32)
        x[:, :, 3] *= 100.0  # outlier feature channel
        batches.append((x, rng.randint(1, 11, size=6).astype(np.int32)))
    scales = calibrate_activations(params, mdef, batches)
    s32 = make_scorer(params, mdef)
    s8 = make_scorer(params, mdef, quantize="int8_static", act_scales=scales)
    x, lengths = batches[0]
    ref = np.asarray(s32(x, lengths))
    got = np.asarray(s8(x, lengths))
    m = np.isfinite(ref)
    assert np.corrcoef(ref[m], got[m])[0, 1] > 0.999
    refm = np.where(m, ref, -np.inf)
    gotm = np.where(m, got, -np.inf)
    assert (refm.argmax(1) == gotm.argmax(1)).mean() >= 5 / 6


def test_static_int8_scorer_quality_and_masking():
    mdef, params = _full_model(seed=14)
    scales = calibrate_activations(params, mdef, _calib_batches(seed=22))
    s32 = make_scorer(params, mdef)
    s8 = make_scorer(params, mdef, quantize="int8_static", act_scales=scales)
    rng = np.random.RandomState(15)
    x = jnp.asarray(rng.randn(6, 10, 8).astype(np.float32))
    lengths = jnp.asarray([10, 7, 3, 10, 1, 5], dtype=jnp.int32)
    ref = np.asarray(s32(x, lengths))
    got = np.asarray(s8(x, lengths))
    np.testing.assert_array_equal(np.isneginf(got), np.isneginf(ref))
    m = np.isfinite(ref)
    assert np.corrcoef(ref[m], got[m])[0, 1] > 0.999
    # top-1 preservation per slate (the serving-quality gate)
    refm = np.where(m, ref, -np.inf)
    gotm = np.where(m, got, -np.inf)
    assert (refm.argmax(1) == gotm.argmax(1)).mean() >= 5 / 6


def test_static_int8_dequant_is_fused_column_scale():
    # the static path must not contain a per-row reduction: an input with a
    # single huge outlier row still quantizes every other row with the SAME
    # (calibrated) scale — unlike dynamic, where the outlier only affects
    # its own row. Verify by checking the static quantize grid directly.
    rng = np.random.RandomState(16)
    w = rng.randn(8, 4).astype(np.float32)
    b = np.zeros(4, dtype=np.float32)
    qp = quantize_dense({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    s_x = 2.0 / 127.0
    qp["x_inv_scale"] = jnp.asarray(1.0 / s_x, dtype=jnp.float32)
    qp["out_scale"] = (s_x * qp["w_scale"]).astype(jnp.float32)
    x = np.full((3, 8), 0.5, dtype=np.float32)
    x[0] *= 100.0  # outlier row: static mode CLIPS it to the calibrated max
    got = np.asarray(q_dense_apply(qp, jnp.asarray(x)))
    # non-outlier rows: quantized on the static grid, close to fp32
    ref = x[1:] @ (np.round(w / np.asarray(qp["w_scale"]))
                   * np.asarray(qp["w_scale"]))
    np.testing.assert_allclose(got[1:], ref, rtol=5e-2, atol=5e-2)
    # outlier row saturates at 127 * s_x = the calibration absmax
    sat = (np.full(8, 2.0, dtype=np.float32)
           @ (np.round(w / np.asarray(qp["w_scale"]))
              * np.asarray(qp["w_scale"])))
    np.testing.assert_allclose(got[0], sat, rtol=5e-2, atol=5e-2)


def test_static_int8_bf16_flow_quality():
    # the production serving configuration: static int8 matmuls with bf16
    # elementwise flow between them — must stay within the quality gates
    mdef, params = _full_model(seed=27)
    scales = calibrate_activations(params, mdef, _calib_batches(seed=28))
    s32 = make_scorer(params, mdef)
    s8 = make_scorer(params, mdef, compute_dtype="bfloat16",
                     quantize="int8_static", act_scales=scales)
    rng = np.random.RandomState(29)
    x = jnp.asarray(rng.randn(6, 10, 8).astype(np.float32))
    lengths = jnp.asarray([10, 7, 3, 10, 1, 5], dtype=jnp.int32)
    ref = np.asarray(s32(x, lengths))
    got = np.asarray(s8(x, lengths))
    assert got.dtype == np.float32  # scores stay fp32
    np.testing.assert_array_equal(np.isneginf(got), np.isneginf(ref))
    m = np.isfinite(ref)
    assert np.corrcoef(ref[m], got[m])[0, 1] > 0.999


def test_static_int8_sharded_scorer_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from allrank_tpu.parallel.mesh import make_mesh

    mdef, params = _full_model(seed=17)
    scales = calibrate_activations(params, mdef, _calib_batches(seed=23))
    mesh = make_mesh(ParallelConfig(data=8))
    sharded = make_sharded_scorer(params, mdef, mesh,
                                  quantize="int8_static", act_scales=scales)
    single = make_scorer(params, mdef, quantize="int8_static",
                         act_scales=scales)
    rng = np.random.RandomState(18)
    x = jnp.asarray(rng.randn(16, 10, 8).astype(np.float32))
    lengths = jnp.asarray(rng.randint(1, 11, size=16), dtype=jnp.int32)
    np.testing.assert_allclose(np.asarray(sharded(x, lengths)),
                               np.asarray(single(x, lengths)),
                               rtol=1e-5, atol=1e-5)


def test_static_int8_export_roundtrip(tmp_path):
    from allrank_tpu.serving import export_scorer, load_scorer

    mdef, params = _full_model(seed=19)
    scales = calibrate_activations(params, mdef, _calib_batches(seed=24))
    scorer = make_scorer(params, mdef, quantize="int8_static",
                         act_scales=scales)
    path = export_scorer(params, mdef, slate_length=10, n_features=8,
                         path=str(tmp_path / "scorer_int8s.hlo"),
                         batch_size=3, quantize="int8_static",
                         act_scales=scales)
    loaded = load_scorer(path)
    rng = np.random.RandomState(25)
    x = jnp.asarray(rng.randn(3, 10, 8).astype(np.float32))
    lengths = jnp.asarray([10, 2, 7], dtype=jnp.int32)
    np.testing.assert_allclose(np.asarray(loaded(x, lengths)),
                               np.asarray(scorer(x, lengths)), rtol=1e-6)


def test_static_int8_requires_calibration():
    mdef, params = _full_model(seed=26)
    with pytest.raises(ValueError, match="act_scales"):
        make_scorer(params, mdef, quantize="int8_static")
    # stale/mismatched calibration (missing sites) fails loud
    with pytest.raises(KeyError, match="site"):
        make_scorer(params, mdef, quantize="int8_static",
                    act_scales={"fc/0": 1.0})


def test_unknown_quantize_mode_raises():
    mdef, params = _full_model(seed=10)
    with pytest.raises(ValueError, match="quantize"):
        make_scorer(params, mdef, quantize="int4")


def test_int8_export_roundtrip(tmp_path):
    from allrank_tpu.serving import export_scorer, load_scorer

    mdef, params = _full_model(seed=11)
    scorer = make_scorer(params, mdef, quantize="int8")
    path = export_scorer(params, mdef, slate_length=10, n_features=8,
                         path=str(tmp_path / "scorer_int8.hlo"),
                         batch_size=3, quantize="int8")
    loaded = load_scorer(path)
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(3, 10, 8).astype(np.float32))
    lengths = jnp.asarray([10, 2, 7], dtype=jnp.int32)
    np.testing.assert_allclose(np.asarray(loaded(x, lengths)),
                               np.asarray(scorer(x, lengths)), rtol=1e-6)


def test_calibration_batches_from_dataset_contract():
    from allrank_tpu.data.dataset import SlateDataset
    from allrank_tpu.quant import calibration_batches_from_dataset

    rng = np.random.RandomState(40)
    docs, n_slates, F = 6, 10, 5
    X = rng.randn(n_slates * docs, F).astype(np.float32)
    y = rng.randint(0, 3, size=n_slates * docs).astype(np.float32)
    qids = np.repeat(np.arange(n_slates), docs)
    ds = SlateDataset(X, y, qids)

    batches = calibration_batches_from_dataset(ds, slate_length=8,
                                               batch_size=4, n_batches=2)
    assert len(batches) == 2
    for x, lengths in batches:
        assert x.shape == (4, 8, F)
        assert lengths.shape == (4,) and (lengths >= 1).all()
        assert (lengths <= 8).all()
    # deterministic (no shuffle): same call -> identical batches
    again = calibration_batches_from_dataset(ds, slate_length=8,
                                             batch_size=4, n_batches=2)
    for (x1, l1), (x2, l2) in zip(batches, again):
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(l1, l2)
