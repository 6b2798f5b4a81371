"""Fully-fused neural-sort→Sinkhorn→contract kernel vs the XLA chain.

Interpreter mode on CPU; the compiled path is exercised on real TPU hardware
(tools/tpu_kernel_checks.py). The reference is the exact XLA pipeline the
kernel replaces: deterministic_neural_sort → sinkhorn_scaling(tol=0) →
pair-pad zeroing → vector contraction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from allrank_tpu.ops.neuralsort_pallas import fused_soft_sort_contract
from allrank_tpu.ops.soft_sort import (
    deterministic_neural_sort,
    sinkhorn_scaling,
)


def _xla_chain(scores, mask, vec, tau, max_iter=50, transpose=False):
    p_hat = deterministic_neural_sort(scores, tau, mask)
    p = sinkhorn_scaling(p_hat, mask, tol=0.0, max_iter=max_iter,
                         backend="xla")
    pair_pad = mask[:, :, None] | mask[:, None, :]
    p = jnp.where(pair_pad, 0.0, p)
    if transpose:
        return jnp.einsum("nij,ni->nj", p, vec)
    return jnp.einsum("nij,nj->ni", p, vec)


def _case(n=4, l=64, seed=0, ragged=True):
    rng = np.random.RandomState(seed)
    scores = jnp.asarray(rng.randn(n, l).astype(np.float32))
    if ragged:
        lengths = np.array([l, l - 3, l // 2, 5][:n] + [l] * max(0, n - 4))
        mask = jnp.asarray(np.arange(l)[None, :] >= lengths[:n, None])
    else:
        mask = jnp.zeros((n, l), dtype=bool)
    vec = jnp.asarray(np.abs(rng.randn(n, l)).astype(np.float32))
    vec = jnp.where(mask, 0.0, vec)
    return scores, mask, vec


@pytest.mark.parametrize("transpose", [False, True])
@pytest.mark.parametrize("ragged", [False, True])
def test_forward_matches_xla_chain(transpose, ragged):
    scores, mask, vec = _case(ragged=ragged)
    with pltpu.force_tpu_interpret_mode():
        out = fused_soft_sort_contract(scores, mask, vec, tau=1.0,
                                       transpose=transpose)
    ref = _xla_chain(scores, mask, vec, 1.0, transpose=transpose)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("transpose", [False, True])
@pytest.mark.parametrize("ragged", [False, True])
def test_gradient_matches_xla_autodiff(transpose, ragged):
    scores, mask, vec = _case(ragged=ragged)

    def loss_fused(s):
        return jnp.sum(jnp.sin(fused_soft_sort_contract(
            s, mask, vec, tau=1.0, transpose=transpose)))

    def loss_xla(s):
        return jnp.sum(jnp.sin(_xla_chain(s, mask, vec, 1.0,
                                          transpose=transpose)))

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused)(scores)
    g_ref = jax.grad(loss_xla)(scores)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=5e-5, rtol=1e-4)


def test_gradient_zero_at_padded_positions():
    scores, mask, vec = _case()

    def loss(s):
        return jnp.sum(fused_soft_sort_contract(s, mask, vec, tau=1.0) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss)(scores)
    assert np.all(np.asarray(g)[np.asarray(mask)] == 0.0)


def test_temperature_and_max_iter_propagate():
    scores, mask, vec = _case(ragged=False)
    with pltpu.force_tpu_interpret_mode():
        out = fused_soft_sort_contract(scores, mask, vec, tau=0.25,
                                       max_iter=20)
    ref = _xla_chain(scores, mask, vec, 0.25, max_iter=20)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_odd_batch_sizes_block_legally():
    for n in (1, 3, 6):
        scores, mask, vec = _case(n=n, l=32, ragged=False)
        with pltpu.force_tpu_interpret_mode():
            out = fused_soft_sort_contract(scores, mask, vec, tau=1.0)
        ref = _xla_chain(scores, mask, vec, 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


def test_fully_padded_slate_is_finite():
    scores, mask, vec = _case(n=2, l=32, ragged=False)
    mask = mask.at[1, :].set(True)
    vec = jnp.where(mask, 0.0, vec)

    def loss(s):
        return jnp.sum(fused_soft_sort_contract(s, mask, vec, tau=1.0))

    with pltpu.force_tpu_interpret_mode():
        out = fused_soft_sort_contract(scores, mask, vec, tau=1.0)
        g = jax.grad(loss)(scores)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.isfinite(np.asarray(g)))
