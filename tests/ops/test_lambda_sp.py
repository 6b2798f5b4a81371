"""Sequence-parallel lambdaLoss (ops/lambda_sp.py): value/grad parity vs
the single-device XLA pair path on the 8-device mesh at long slates, the
dispatch gate, padding for non-divisible lengths, and slate masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from allrank_tpu.losses.lambdaloss import lambdaLoss

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _mesh222():
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "model", "sequence"))


def _slates(B, L, seed=0, pad_frac=0.1):
    rng = np.random.RandomState(seed)
    y_pred = rng.randn(B, L).astype(np.float32)
    y_true = rng.randint(0, 5, size=(B, L)).astype(np.float32)
    n_pad = int(L * pad_frac)
    if n_pad:
        y_true[:, -n_pad:] = -1.0
    return jnp.asarray(y_pred), jnp.asarray(y_true)


@pytest.mark.parametrize("scheme,L,k", [
    ("ndcgLoss2PP_scheme", 2048, None),
    ("ndcgLoss2_scheme", 2048, None),
    ("lambdaRank_scheme", 2048, None),
    ("ndcgLoss1_scheme", 2048, None),
    (None, 2048, None),
    ("rankNetWeightedByGTDiff_scheme", 2048, None),
    ("ndcgLoss2PP_scheme", 4096, None),
    ("ndcgLoss2PP_scheme", 2048, 2048),  # explicit k == L
])
def test_sp_value_and_grad_parity(scheme, L, k):
    y_pred, y_true = _slates(2, L, seed=hash((scheme, L)) % 2**31)
    kw = dict(weighing_scheme=scheme, k=k, reduction="mean")

    ref = lambdaLoss(y_pred, y_true, **kw)
    g_ref = jax.grad(lambda yp: lambdaLoss(yp, y_true, **kw))(y_pred)

    with _mesh222():
        sp = lambdaLoss(y_pred, y_true, **kw)
        g_sp = jax.grad(lambda yp: lambdaLoss(yp, y_true, **kw))(y_pred)

    np.testing.assert_allclose(float(sp), float(ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                               rtol=2e-4, atol=1e-7)


def test_sp_pads_non_divisible_lengths():
    # L=2050 is not divisible by the 2-way sequence axis -> padded cols
    # (valid=0) must select no pairs and reproduce the unsharded value
    y_pred, y_true = _slates(2, 2050, seed=7)
    ref = lambdaLoss(y_pred, y_true, weighing_scheme="ndcgLoss2PP_scheme")
    with _mesh222():
        sp = lambdaLoss(y_pred, y_true, weighing_scheme="ndcgLoss2PP_scheme")
    np.testing.assert_allclose(float(sp), float(ref), rtol=2e-5)


def test_sp_respects_slate_mask():
    y_pred, y_true = _slates(4, 2048, seed=9)
    mask = jnp.asarray([True, False, True, False])
    ref = lambdaLoss(y_pred, y_true, weighing_scheme="lambdaRank_scheme",
                     slate_mask=mask, reduction="mean")
    with _mesh222():
        sp = lambdaLoss(y_pred, y_true, weighing_scheme="lambdaRank_scheme",
                        slate_mask=mask, reduction="mean")
    np.testing.assert_allclose(float(sp), float(ref), rtol=2e-5)


def test_sp_gate_thresholds():
    from allrank_tpu.ops.lambda_sp import sp_lambda_dispatch

    # no mesh -> no SP
    assert sp_lambda_dispatch(4096, 4) is None
    with _mesh222():
        # below the autotune threshold -> single-device paths keep the shape
        assert sp_lambda_dispatch(512, 4) is None
        assert sp_lambda_dispatch(2048, 4) is not None


def test_sp_short_slates_unchanged_under_mesh():
    # under the mesh but below the threshold: values equal the XLA path
    # (whatever dispatch runs, the loss must not change)
    y_pred, y_true = _slates(4, 240, seed=11, pad_frac=0.2)
    ref = lambdaLoss(y_pred, y_true, weighing_scheme="ndcgLoss2PP_scheme")
    with _mesh222():
        got = lambdaLoss(y_pred, y_true, weighing_scheme="ndcgLoss2PP_scheme")
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
