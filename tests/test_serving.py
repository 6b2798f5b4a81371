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
