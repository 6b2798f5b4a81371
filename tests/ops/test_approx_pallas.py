"""Fused approxNDCG rank-sum kernel vs the XLA chain (interpret mode), at
the kernel level and through the whole loss with the dispatch forced on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import allrank_tpu.losses.approxndcg as A
from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.ops.approx_pallas import fused_approx_pos


def _xla_pos_sum(s, valid, alpha, eps):
    l = s.shape[1]
    pv = (valid[:, :, None] & valid[:, None, :]) & (
        ~jnp.eye(l, dtype=bool))[None, :, :]
    d = jnp.where(pv, s[:, :, None] - s[:, None, :], 0.0)
    return jnp.sum(
        pv.astype(jnp.float32) * jnp.maximum(jax.nn.sigmoid(-alpha * d), eps),
        axis=-1,
    )


def _case(b=4, l=40, seed=0):
    rng = np.random.RandomState(seed)
    s = jnp.asarray(rng.randn(b, l).astype(np.float32))
    lengths = np.array([l, l - 3, l // 2, 2][:b] + [l] * max(0, b - 4))
    valid = jnp.asarray(np.arange(l)[None, :] < lengths[:b, None])
    return s, valid


@pytest.mark.parametrize("alpha", [1.0, 4.0])
def test_kernel_matches_xla(alpha):
    s, valid = _case()
    ref = _xla_pos_sum(s, valid, alpha, 1e-10)
    with pltpu.force_tpu_interpret_mode():
        out = fused_approx_pos(s, valid.astype(jnp.float32),
                               alpha=alpha, eps=1e-10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kernel_gradient_matches_xla():
    s, valid = _case()

    def loss_ref(s):
        return jnp.sum(jnp.sin(_xla_pos_sum(s, valid, 2.0, 1e-10)))

    def loss_kern(s):
        return jnp.sum(jnp.sin(fused_approx_pos(
            s, valid.astype(jnp.float32), alpha=2.0, eps=1e-10)))

    g_ref = jax.grad(loss_ref)(s)
    with pltpu.force_tpu_interpret_mode():
        g_kern = jax.grad(loss_kern)(s)
    np.testing.assert_allclose(np.asarray(g_kern), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)


def test_loss_level_dispatch_matches(monkeypatch):
    """approxNDCGLoss value+grad with the fused path forced on equals the
    XLA path — covers the sort/valid/outer-chain wiring."""
    rng = np.random.RandomState(3)
    b, l = 4, 32
    y_pred = jnp.asarray(rng.randn(b, l).astype(np.float32))
    y_true = rng.randint(0, 5, size=(b, l)).astype(np.float32)
    y_true[0, -4:] = PADDED_Y_VALUE
    y_true[2, 5:] = PADDED_Y_VALUE
    y_true = jnp.asarray(y_true)

    def loss(p):
        return A.approxNDCGLoss(p, y_true, alpha=1.5)

    import allrank_tpu.ops.approx_pallas as AP

    monkeypatch.setattr(AP, "approx_pos_available", lambda *a: False)
    v_xla, g_xla = jax.value_and_grad(loss)(y_pred)

    monkeypatch.setattr(AP, "approx_pos_available", lambda *a: True)
    with pltpu.force_tpu_interpret_mode():
        v_fused, g_fused = jax.value_and_grad(loss)(y_pred)

    assert float(v_fused) == pytest.approx(float(v_xla), abs=1e-6)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                               atol=1e-5, rtol=1e-5)
