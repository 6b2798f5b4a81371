"""Golden tests for ndcg/dcg/mrr, carried over from the reference suite
(reference: tests/losses/test_ndcg.py, tests/losses/test_mrr.py)."""

import math

import numpy as np
from pytest import approx

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.metrics import dcg, mrr, ndcg


def ndcg_wrap(y_pred, y_true, ats=None):
    return np.asarray(ndcg(np.array([y_pred]), np.array([y_true]), ats=ats))


def mrr_wrap(y_pred, y_true, ats=(10,)):
    return np.asarray(mrr(np.array(y_pred), np.array(y_true), ats=ats))


class TestNdcg:
    def test_simple_1(self):
        assert ndcg_wrap([0.5, 0.2], [1.0, 0.0]) == approx(1.0)

    def test_simple_2(self):
        assert ndcg_wrap([0.5, 0.2], [0.0, 1.0]) == approx(1 / math.log2(3))

    def test_filler_when_no_relevant(self):
        # IDCG == 0 slates score filler_value = 1.0 (XGBoost/LightGBM convention,
        # reference metrics.py:23-24 + reproducibility/HOWTO.md:32). Note the
        # reference's own test_ndcg_zero_when_no_relevant expects 0.0 and FAILS
        # against its own code; we follow the code + documented convention.
        assert ndcg_wrap([0.5, 0.2], [0.0, 0.0]) == approx(1.0)
        assert ndcg_wrap([0.5, 0.2], [0.0, 0.0], ats=[5]) == approx(1.0)

    def test_multiple_ats(self):
        result = ndcg_wrap([0.5, 0.2, 0.1], [1.0, 0.0, 1.0], ats=[1, 2])
        ndcg_one_on_top = 1.0 / (1.0 + 1 / math.log2(3))
        assert result[0] == approx([1.0, ndcg_one_on_top])

    def test_padded_input(self):
        assert ndcg_wrap([0.5, 0.2, 1.0], [1.0, 0.0, PADDED_Y_VALUE]) == approx(1.0)

    def test_padded_input_2(self):
        assert ndcg_wrap([0.5, 0.2, 1.0], [0.0, 1.0, PADDED_Y_VALUE]) == approx(
            1 / math.log2(3)
        )

    def test_padding_invariance(self):
        a = ndcg_wrap([0.5, 0.2], [1.0, 2.0])
        b = ndcg_wrap([0.5, 0.2, 0.9, 0.8], [1.0, 2.0, PADDED_Y_VALUE, PADDED_Y_VALUE])
        assert a == approx(b)

    def test_at_larger_than_slate_clamps(self):
        a = ndcg_wrap([0.5, 0.2], [1.0, 2.0], ats=[100])
        b = ndcg_wrap([0.5, 0.2], [1.0, 2.0], ats=[2])
        assert a == approx(b)


class TestDcg:
    def test_simple(self):
        res = np.asarray(dcg(np.array([[0.5, 0.2]]), np.array([[1.0, 0.0]])))
        assert res[0][0] == approx(1.0)

    def test_order_by_preds(self):
        res = np.asarray(dcg(np.array([[0.2, 0.5]]), np.array([[1.0, 0.0]])))
        assert res[0][0] == approx(1 / math.log2(3))


class TestMrr:
    def test_simple_1(self):
        assert mrr_wrap([[0.5, 0.2]], [[1.0, 0.0]])[0][0] == 1.0

    def test_simple_no_ats(self):
        assert mrr_wrap([[0.5, 0.2]], [[1.0, 0.0]], ats=None)[0][0] == 1.0

    def test_simple_2(self):
        assert mrr_wrap([[0.5, 0.2]], [[0.0, 1.0]])[0][0] == 0.5

    def test_multiple_slates(self):
        res = mrr_wrap([[0.2, 0.5], [0.5, 0.2]], [[0.0, 1.0], [0.0, 1.0]])
        assert res[0][0] == 1.0
        assert res[1][0] == 0.5

    def test_multiple_ats(self):
        res = mrr_wrap([[0.5, 0.2]], [[0.0, 1.0]], ats=[1, 2])
        assert res[0][0] == 0.0
        assert res[0][1] == 0.5

    def test_multiple_slates_multiple_ats(self):
        res = mrr_wrap([[0.2, 0.5], [0.5, 0.2]], [[0.0, 1.0], [0.0, 1.0]], ats=[1, 2])
        assert res[0][0] == 1.0
        assert res[0][1] == 1.0
        assert res[1][0] == 0.0
        assert res[1][1] == 0.5

    def test_zero_when_no_relevant(self):
        assert mrr_wrap([[0.5, 0.2]], [[0.0, 0.0]])[0][0] == 0.0

    def test_padded_input(self):
        assert mrr_wrap([[0.5, 0.2, 1.0]], [[1.0, 0.0, PADDED_Y_VALUE]])[0][0] == 1.0

    def test_padded_input_2(self):
        assert mrr_wrap([[0.5, 0.2, 1.0]], [[0.0, 1.0, PADDED_Y_VALUE]])[0][0] == 0.5


def test_mrr_strict_zeroes_per_slate():
    """strict=True handles mixed batches correctly (the default replicates
    the reference's batch-global quirk, metrics.py:108-109)."""
    import jax.numpy as jnp

    from allrank_tpu.metrics import mrr

    y_pred = jnp.asarray([[0.9, 0.1, 0.2], [0.3, 0.8, 0.1]])
    y_true = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 1.0, 0.0]])  # slate 0: blank
    quirky = mrr(y_pred, y_true, ats=[3])
    strict = mrr(y_pred, y_true, ats=[3], strict=True)
    # quirk: batch has SOME relevant docs -> blank slate 0 still scores 1.0
    assert float(quirky[0, 0]) == 1.0
    assert float(strict[0, 0]) == 0.0
    assert float(strict[1, 0]) == 1.0  # best doc ranked first


class TestMap:
    """MAP@k (beyond the reference zoo): binarized at >=1, AP@k / min(R, k),
    blank slates -> filler 1.0 (the framework's blank-query convention)."""

    def _map(self, y_pred, y_true, ats=None, **kw):
        from allrank_tpu.metrics import map_

        return np.asarray(map_(np.array([y_pred]), np.array([y_true]),
                               ats=ats, **kw))[0]

    def test_perfect_ranking(self):
        assert self._map([0.9, 0.8, 0.1], [2.0, 1.0, 0.0]) == approx(1.0)

    def test_known_value(self):
        # relevant docs land at ranks 1 and 3: AP = (1/1 + 2/3) / 2
        assert self._map([0.9, 0.8, 0.7], [1.0, 0.0, 1.0]) == approx(
            (1.0 + 2.0 / 3.0) / 2.0)

    def test_cutoff_denominator_is_min_R_k(self):
        # at k=1 with the top doc relevant, AP@1 = 1 even though R=2
        assert self._map([0.9, 0.8, 0.7], [1.0, 0.0, 1.0],
                         ats=[1]) == approx(1.0)

    def test_blank_slate_filler(self):
        assert self._map([0.9, 0.8], [0.0, 0.0]) == approx(1.0)
        assert self._map([0.9, 0.8], [0.0, 0.0],
                         filler_value=0.0) == approx(0.0)

    def test_padding_invariance(self):
        base = self._map([0.9, 0.8, 0.7], [1.0, 0.0, 1.0], ats=[3])
        padded = self._map([0.9, 0.8, 0.7, -5.0, -6.0],
                           [1.0, 0.0, 1.0, PADDED_Y_VALUE, PADDED_Y_VALUE],
                           ats=[3])
        assert padded == approx(base)

    def test_against_numpy_reference(self):
        rng = np.random.RandomState(0)
        y_pred = rng.randn(16, 12).astype(np.float32)
        y_true = rng.randint(0, 3, size=(16, 12)).astype(np.float32)
        y_true[:, 9:] = PADDED_Y_VALUE
        from allrank_tpu.metrics import map_

        got = np.asarray(map_(y_pred, y_true, ats=[5, 12]))
        for b in range(16):
            order = np.argsort(-y_pred[b, :9], kind="stable")
            rel = (y_true[b, :9][order] >= 1.0).astype(float)
            R = rel.sum()
            for j, k in enumerate([5, 12]):
                k_eff = min(k, 9 + 3)  # ats clamp happens at full slate len
                r = rel[:k_eff]
                if R == 0:
                    expected = 1.0
                else:
                    prec = np.cumsum(r) / (np.arange(len(r)) + 1)
                    expected = (r * prec).sum() / min(R, k)
                assert got[b, j] == approx(expected, abs=1e-5)


class TestErr:
    """ERR@k (Chapelle 2009), stop prob (2^y - 1) / 2^max_rel."""

    def _err(self, y_pred, y_true, ats=None, **kw):
        from allrank_tpu.metrics import err

        return np.asarray(err(np.array([y_pred]), np.array([y_true]),
                              ats=ats, **kw))[0]

    def test_single_doc(self):
        # one doc with grade 4: ERR = (2^4 - 1) / 2^4 = 0.9375
        assert self._err([0.5], [4.0]) == approx(15.0 / 16.0)

    def test_two_docs_hand_computed(self):
        # ranks: grade 2 then grade 1. R1 = 3/16, R2 = 1/16.
        r1, r2 = 3.0 / 16.0, 1.0 / 16.0
        expected = r1 + 0.5 * (1 - r1) * r2
        assert self._err([0.9, 0.1], [2.0, 1.0]) == approx(expected)

    def test_cutoff(self):
        r1 = 3.0 / 16.0
        assert self._err([0.9, 0.1], [2.0, 1.0], ats=[1]) == approx(r1)

    def test_blank_slate_is_zero(self):
        assert self._err([0.9, 0.1], [0.0, 0.0]) == approx(0.0)

    def test_padding_invariance(self):
        base = self._err([0.9, 0.1], [2.0, 1.0])
        padded = self._err([0.9, 0.1, -5.0], [2.0, 1.0, PADDED_Y_VALUE])
        assert padded == approx(base)

    def test_orders_by_predictions(self):
        # best grade ranked last should score lower than ranked first
        good = self._err([0.9, 0.1], [4.0, 0.0])
        bad = self._err([0.1, 0.9], [4.0, 0.0])
        assert good > bad
