"""Loss-level parity of the fused neural-sort kernel path inside NeuralNDCG.

tests/ops/test_neuralsort_pallas.py proves the kernel against the raw XLA
chain; this file proves the *wiring* in losses/neuralndcg.py — sample-major
flattening, gains tiling, transposed discount broadcast, and the final
NDCG reduction — by forcing the fused dispatch on (interpreter mode) and
comparing value and gradient against the default XLA path for all four
{deterministic, stochastic} x {normal, transposed} variants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import allrank_tpu.losses.neuralndcg as nn_mod
from allrank_tpu.constants import PADDED_Y_VALUE


def _case(b=4, l=16, seed=0):
    rng = np.random.RandomState(seed)
    y_pred = jnp.asarray(rng.randn(b, l).astype(np.float32))
    y_true = rng.randint(0, 5, size=(b, l)).astype(np.float32)
    lengths = [l, l - 2, l // 2, 3][:b] + [l] * max(0, b - 4)
    for i, n in enumerate(lengths):
        y_true[i, n:] = PADDED_Y_VALUE
    return y_pred, jnp.asarray(y_true)


@pytest.mark.parametrize("transposed", [False, True])
@pytest.mark.parametrize("stochastic", [False, True])
def test_fused_path_matches_xla_path(monkeypatch, transposed, stochastic):
    y_pred, y_true = _case()
    fun = nn_mod.neuralNDCG_transposed if transposed else nn_mod.neuralNDCG
    rng = jax.random.PRNGKey(3) if stochastic else None
    kw = dict(temperature=0.8, stochastic=stochastic, n_samples=3, rng=rng)

    def loss(p):
        return fun(p, y_true, **kw)

    monkeypatch.setattr(nn_mod, "soft_sort_available", lambda *a: False)
    v_xla, g_xla = jax.value_and_grad(loss)(y_pred)

    monkeypatch.setattr(nn_mod, "soft_sort_available", lambda *a: True)
    with pltpu.force_tpu_interpret_mode():
        v_fused, g_fused = jax.value_and_grad(loss)(y_pred)

    assert float(v_fused) == pytest.approx(float(v_xla), abs=2e-5)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                               atol=5e-5, rtol=1e-4)
