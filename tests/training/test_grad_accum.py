"""Gradient accumulation: A micro-batches must reproduce the full-batch
optimizer step (per-slate-mean losses combine exactly via valid-slate
weighting), including with padded dummy slates in the batch."""

import jax
import numpy as np
import pytest

from allrank_tpu.data.batching import SlateBatch
from allrank_tpu.losses import get_loss
from allrank_tpu.models.factory import init_params, make_model
from allrank_tpu.config import (
    FCConfig,
    ModelConfig,
    PostModelConfig,
    TransformerConfig,
)
from allrank_tpu.training import make_optimizer
from allrank_tpu.training.train_utils import make_train_step


def _mdef():
    return make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[16], input_norm=False, activation="ReLU",
                              dropout=0.0),
            transformer=TransformerConfig(N=1, d_ff=32, h=2,
                                          positional_encoding=None,
                                          dropout=0.0),
            post_model=PostModelConfig(d_output=1),
        ),
        n_features=8,
    )


def _batch(b=8, l=12, feats=8, n_dummy=0, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, l, feats).astype(np.float32)
    y = rng.randint(0, 4, size=(b, l)).astype(np.float32)
    y[:, -2:] = -1.0
    indices = np.tile(np.arange(l, dtype=np.int32), (b, 1))
    indices[:, -2:] = -1
    slate_mask = np.ones(b, dtype=bool)
    if n_dummy:
        slate_mask[-n_dummy:] = False
        y[-n_dummy:] = -1.0
    return SlateBatch(x, y, indices, slate_mask)


def _run(accum, loss_name="listNet", n_dummy=0, steps=3, loss_args=None,
         lr=1e-1):
    # SGD, not Adam: several biases have *exactly zero* gradient under a
    # shift-invariant loss (softmax), and Adam's bias-corrected first step
    # amplifies each path's different fp noise on them to a full ±lr update.
    # SGD keeps the param delta proportional to the gradient delta (~1e-9).
    mdef = _mdef()
    params = init_params(jax.random.PRNGKey(0), mdef)
    opt = make_optimizer("SGD", {"lr": lr})
    from allrank_tpu.losses import accumulation_weighting

    loss_fn, needs_rng = get_loss(loss_name)
    step = make_train_step(mdef, loss_fn, dict(loss_args or {}), needs_rng,
                           opt, None, accumulation_steps=accum,
                           accum_weighting=accumulation_weighting(
                               loss_name, loss_args))
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(1)
    batch = _batch(n_dummy=n_dummy)
    losses = []
    for _ in range(steps):
        params, opt_state, rng, loss, n_real = step(
            params, opt_state, rng, batch)
        losses.append(float(loss))
    return params, losses


@pytest.mark.parametrize("accum", [2, 4])
def test_accumulated_step_matches_full_batch(accum):
    p_full, l_full = _run(1)
    p_acc, l_acc = _run(accum)
    np.testing.assert_allclose(l_acc, l_full, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_accumulation_with_dummy_slates_matches():
    """Valid-slate weighting keeps the update exact when a micro-batch is
    partially (or fully) dummy padding."""
    p_full, l_full = _run(1, n_dummy=3)
    p_acc, l_acc = _run(4, n_dummy=3)  # last micro is fully dummy
    np.testing.assert_allclose(l_acc, l_full, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_indivisible_batch_raises():
    mdef = _mdef()
    params = init_params(jax.random.PRNGKey(0), mdef)
    opt = make_optimizer("Adam", {"lr": 1e-2})
    loss_fn, needs_rng = get_loss("listNet")
    step = make_train_step(mdef, loss_fn, {}, needs_rng, opt, None,
                           accumulation_steps=3)
    with pytest.raises(ValueError, match="not divisible"):
        step(params, opt.init(params), jax.random.PRNGKey(1), _batch(b=8))


@pytest.mark.parametrize("loss_name,loss_args", [
    ("lambdaLoss", {"weighing_scheme": "ndcgLoss2PP_scheme", "mu": 10.0}),
])
def test_accumulation_matches_for_non_slate_mean_losses(loss_name, loss_args):
    """Sum-reduction (the paper lambdaLoss) must also reproduce the
    full-batch update — regression for the silent 1/n_valid gradient
    rescale the slate-weighted combination caused for reduction='sum'."""
    # sum-reduction losses have O(100) values; lr scaled down so fp
    # summation-order noise is not chaotically amplified across steps
    p_full, l_full = _run(1, loss_name=loss_name, loss_args=loss_args,
                          lr=1e-3)
    p_acc, l_acc = _run(2, loss_name=loss_name, loss_args=loss_args,
                        lr=1e-3)
    np.testing.assert_allclose(l_acc, l_full, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_accumulation_matches_for_ordinal_doc_count_weighting():
    """ordinal normalizes by valid-document count; ragged micro-batches must
    still combine exactly (weight = docs, not slates)."""
    from allrank_tpu.losses import accumulation_weighting

    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[16], input_norm=False, activation="ReLU",
                              dropout=0.0),
            transformer=None,
            post_model=PostModelConfig(d_output=4,
                                       output_activation="Sigmoid"),
        ),
        n_features=8,
    )
    loss_fn, needs_rng = get_loss("ordinal")
    opt = make_optimizer("SGD", {"lr": 1e-1})

    batch = _batch(b=8, seed=5)
    # ragged doc counts across micro halves: first half keeps 10 docs/slate,
    # second half only 4 — slate weighting would misweight these
    y = np.array(batch.y)
    y[4:, 4:] = -1.0
    idx = np.array(batch.indices)
    idx[4:, 4:] = -1
    batch = SlateBatch(batch.x, y, idx, batch.slate_mask)

    def run(accum):
        params = init_params(jax.random.PRNGKey(0), mdef)
        step = make_train_step(mdef, loss_fn, {"n": 4}, needs_rng, opt, None,
                               accumulation_steps=accum,
                               accum_weighting=accumulation_weighting(
                                   "ordinal", {"n": 4}))
        opt_state = opt.init(params)
        rng = jax.random.PRNGKey(1)
        for _ in range(3):
            params, opt_state, rng, loss, _ = step(params, opt_state, rng,
                                                   batch)
        return params, float(loss)

    (p_full, l_full), (p_acc, l_acc) = run(1), run(2)
    assert l_acc == pytest.approx(l_full, rel=1e-5)
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_accumulation_matches_for_bce_slate_normalizer():
    """bce normalizes by slates-with-any-valid-doc; binary labels keep the
    loss scale sane so fp noise stays below tolerance."""
    from allrank_tpu.losses import accumulation_weighting

    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[16], input_norm=True, activation="ReLU",
                              dropout=0.0),
            transformer=None,
            post_model=PostModelConfig(d_output=1,
                                       output_activation="Sigmoid"),
        ),
        n_features=8,
    )
    loss_fn, needs_rng = get_loss("bce")
    opt = make_optimizer("SGD", {"lr": 1e-2})
    batch = _batch(seed=11)
    y = np.clip(np.array(batch.y), -1.0, 1.0)  # binary labels, pads kept
    batch = SlateBatch(batch.x, y, batch.indices, batch.slate_mask)

    def run(accum):
        params = init_params(jax.random.PRNGKey(0), mdef)
        step = make_train_step(mdef, loss_fn, {}, needs_rng, opt, None,
                               accumulation_steps=accum,
                               accum_weighting=accumulation_weighting(
                                   "bce", {}))
        opt_state = opt.init(params)
        rng = jax.random.PRNGKey(1)
        # one step: the doc-sum loss is O(500), so multi-step comparisons
        # chaotically amplify fp summation-order noise
        params, opt_state, rng, loss, _ = step(params, opt_state, rng, batch)
        return params, float(loss)

    (p_full, l_full), (p_acc, l_acc) = run(1), run(2)
    assert l_acc == pytest.approx(l_full, rel=1e-5)
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
