"""Pair-tiled lambdaLoss kernel vs the XLA path — interpreter mode.

Forces small (bb, Ti, Tj) tiles so the grid really spans multiple i- and
j-tiles, exercising the forward/row-gradient accumulation over revisited
j-blocks AND the column-gradient aux-output reduction over i-tiles.
Compared at the loss level (value AND gradient) against the pure XLA path
for every weighing scheme, both reductions, both log bases, and
k truncation. Inputs use L=40 (padded to 128 inside the wrapper), so the
lane-padding path is always on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import allrank_tpu.losses.lambdaloss as LL
import allrank_tpu.ops.lambda_pallas as LP
import allrank_tpu.ops.lambda_tiled as LT
from allrank_tpu.losses.lambdaloss import WEIGHING_SCHEMES, lambdaLoss


def _batch(B=6, L=40, seed=0):
    rng = np.random.RandomState(seed)
    y_pred = jnp.asarray(rng.randn(B, L).astype(np.float32))
    y_true = rng.randint(0, 5, size=(B, L)).astype(np.float32)
    y_true[1, L // 2:] = -1.0   # padded tail
    y_true[2, :] = -1.0         # fully padded slate
    return y_pred, jnp.asarray(y_true)


@pytest.fixture
def force_tiled(monkeypatch):
    monkeypatch.setattr(LP, "lambda_pairs_available", lambda *a: False)
    monkeypatch.setattr(LT, "tiled_lambda_preferred", lambda *a: True)
    monkeypatch.setattr(LT, "_pick_tiles",
                        lambda b, l, **kw: (2, l // 4, l // 2))
    LT._make_tiled.cache_clear()


def _compare(monkeypatch_off, y_pred, y_true, **kw):
    def loss(p):
        return lambdaLoss(p, y_true, **kw)

    with monkeypatch_off:
        v_ref, g_ref = jax.value_and_grad(loss)(y_pred)
    with pltpu.force_tpu_interpret_mode():
        v_tiled, g_tiled = jax.value_and_grad(loss)(y_pred)
    assert float(v_tiled) == pytest.approx(float(v_ref), rel=1e-5, abs=1e-5)
    np.testing.assert_allclose(np.asarray(g_tiled), np.asarray(g_ref),
                               atol=2e-5, rtol=1e-4)


class _XlaPath:
    """Context that forces the pure XLA branch inside lambdaLoss."""

    def __enter__(self):
        self._orig = (LP.lambda_pairs_available, LT.tiled_lambda_preferred)
        LP.lambda_pairs_available = lambda *a: False
        LT.tiled_lambda_preferred = lambda *a: False
        return self

    def __exit__(self, *exc):
        LP.lambda_pairs_available, LT.tiled_lambda_preferred = self._orig


ALL_SCHEMES = [None] + list(WEIGHING_SCHEMES)


@pytest.mark.parametrize("scheme", ALL_SCHEMES)
def test_value_and_grad_match_xla(force_tiled, scheme):
    y_pred, y_true = _batch()
    _compare(_XlaPath(), y_pred, y_true, weighing_scheme=scheme)


@pytest.mark.parametrize("reduction", ["sum", "mean"])
@pytest.mark.parametrize("log_base", ["binary", "natural"])
def test_reductions_and_log_bases(force_tiled, reduction, log_base):
    y_pred, y_true = _batch(seed=1)
    _compare(_XlaPath(), y_pred, y_true,
             weighing_scheme="ndcgLoss2PP_scheme", reduction=reduction,
             reduction_log=log_base)


def test_k_truncation(force_tiled):
    y_pred, y_true = _batch(seed=2)
    _compare(_XlaPath(), y_pred, y_true,
             weighing_scheme="lambdaRank_scheme", k=7)


def test_slate_mask(force_tiled):
    y_pred, y_true = _batch(seed=3)
    sm = np.array([True, True, True, False, True, False])
    _compare(_XlaPath(), y_pred, y_true,
             weighing_scheme="ndcgLoss2_scheme", slate_mask=sm)


def test_odd_length_tiles(force_tiled, monkeypatch):
    """Non-lane-multiple L (like WEB30K-eval 1308) pads and still matches."""
    monkeypatch.setattr(LT, "_pick_tiles",
                        lambda b, l, **kw: (1, l // 2, l // 4))
    LT._make_tiled.cache_clear()
    y_pred, y_true = _batch(L=39, seed=4)
    _compare(_XlaPath(), y_pred, y_true,
             weighing_scheme="ndcgLoss2PP_scheme")


def test_picker_handles_web30k_shapes():
    assert LT._padded_len(1308) == 1408
    got = LT._pick_tiles(64, LT._padded_len(1308))
    assert got is not None
    bb, ti, tj = got
    assert 1408 % ti == 0 and 1408 % tj == 0 and 64 % bb == 0
    assert LT._pick_tiles(64, 1024) is not None
    # non-128-multiple lengths are the wrapper's job, not the picker's
    assert LT._pick_tiles(64, 1308) is None
