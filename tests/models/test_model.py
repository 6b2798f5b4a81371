"""Model tower tests: shapes, masking isolation, scoring semantics, jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from allrank_tpu.config import Config
from allrank_tpu.models import forward, init_params, make_model, num_params, score

BASE_CONFIG = {
    "model": {
        "fc_model": {"sizes": [16], "input_norm": False, "activation": None, "dropout": 0.0},
        "transformer": {
            "N": 2, "d_ff": 32, "h": 2,
            "positional_encoding": None, "dropout": 0.0,
        },
        "post_model": {"output_activation": "Sigmoid", "d_output": 4},
    },
    "data": {"path": "", "num_workers": 0, "batch_size": 4, "slate_length": 8,
             "validation_ds_role": "vali"},
    "optimizer": {"name": "Adam", "args": {"lr": 0.001}},
    "lr_scheduler": {"name": "StepLR", "args": {"step_size": 3, "gamma": 0.5}},
    "training": {"epochs": 1, "early_stopping_patience": 10,
                 "gradient_clipping_norm": None},
    "val_metric": "ndcg_5",
    "metrics": ["ndcg_5"],
    "loss": {"name": "ordinal", "args": {"n": 4}},
}


def build(cfg_overrides=None, n_features=10):
    import copy
    cfg = copy.deepcopy(BASE_CONFIG)
    if cfg_overrides:
        cfg["model"].update(cfg_overrides)
    config = Config.from_dict(cfg)
    mdef = make_model(config.model, n_features)
    params = init_params(jax.random.PRNGKey(0), mdef)
    return mdef, params


def make_batch(b=3, l=8, f=10, pad_from=None, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, l, f).astype(np.float32)
    y = rng.randint(0, 3, size=(b, l)).astype(np.float32)
    indices = np.tile(np.arange(l), (b, 1))
    if pad_from is not None:
        x[:, pad_from:] = 0.0
        y[:, pad_from:] = -1
        indices[:, pad_from:] = -1
    mask = y == -1
    return jnp.array(x), jnp.array(y), jnp.array(mask), jnp.array(indices)


def test_forward_shapes_multi_output():
    mdef, params = build()
    x, y, mask, idx = make_batch()
    out = forward(params, mdef, x, mask, idx)
    assert out.shape == (3, 8, 4)
    s = score(params, mdef, x, mask, idx)
    assert s.shape == (3, 8)
    np.testing.assert_allclose(np.asarray(s), np.asarray(out).sum(-1), rtol=1e-6)


def test_forward_squeezes_single_output():
    mdef, params = build({"post_model": {"output_activation": None, "d_output": 1}})
    x, y, mask, idx = make_batch()
    out = forward(params, mdef, x, mask, idx)
    assert out.shape == (3, 8)
    np.testing.assert_allclose(np.asarray(score(params, mdef, x, mask, idx)),
                               np.asarray(out))


def test_padded_docs_do_not_affect_valid_scores():
    mdef, params = build()
    x, y, mask, idx = make_batch(pad_from=5)
    s_padded = np.asarray(score(params, mdef, x, mask, idx))[:, :5]

    x2, y2, mask2, idx2 = make_batch()
    x2, mask2, idx2 = x2[:, :5], mask2[:, :5], idx2[:, :5]
    s_short = np.asarray(score(params, mdef, x2, mask2, idx2))
    np.testing.assert_allclose(s_padded, s_short, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("strategy", ["fixed", "learned"])
def test_positional_encoding(strategy):
    mdef, params = build({
        "transformer": {
            "N": 1, "d_ff": 32, "h": 2,
            "positional_encoding": {"strategy": strategy, "max_indices": 20},
            "dropout": 0.0,
        }
    })
    x, y, mask, idx = make_batch(pad_from=5)
    s = score(params, mdef, x, mask, idx)
    assert np.isfinite(np.asarray(s)).all()
    # different original ranks must change scores (PE is rank-indexed)
    idx_shifted = jnp.where(mask, idx, idx + 3)
    s2 = score(params, mdef, x, mask, idx_shifted)
    assert not np.allclose(np.asarray(s)[:, :5], np.asarray(s2)[:, :5])


def test_mlp_only_no_transformer():
    mdef, params = build({"transformer": None,
                          "post_model": {"output_activation": None, "d_output": 1}})
    x, y, mask, idx = make_batch()
    out = score(params, mdef, x, mask, idx)
    assert out.shape == (3, 8)


def test_no_fc_model_uses_raw_features():
    mdef, params = build({"fc_model": None,
                          "transformer": {"N": 1, "d_ff": 16, "h": 1,
                                          "positional_encoding": None, "dropout": 0.0},
                          "post_model": {"output_activation": None, "d_output": 1}})
    assert mdef.output.d_model == 10
    x, y, mask, idx = make_batch()
    assert score(params, mdef, x, mask, idx).shape == (3, 8)


def test_dropout_deterministic_given_key_and_off_in_eval():
    mdef, params = build({
        "fc_model": {"sizes": [16], "input_norm": True, "activation": "ReLU",
                     "dropout": 0.5},
        "transformer": {"N": 1, "d_ff": 32, "h": 2, "positional_encoding": None,
                        "dropout": 0.5},
    })
    x, y, mask, idx = make_batch()
    key = jax.random.PRNGKey(3)
    a = np.asarray(score(params, mdef, x, mask, idx, train=True, rng=key))
    b = np.asarray(score(params, mdef, x, mask, idx, train=True, rng=key))
    c = np.asarray(score(params, mdef, x, mask, idx, train=True,
                         rng=jax.random.PRNGKey(4)))
    eval_a = np.asarray(score(params, mdef, x, mask, idx))
    eval_b = np.asarray(score(params, mdef, x, mask, idx))
    np.testing.assert_allclose(a, b)
    assert not np.allclose(a, c)
    np.testing.assert_allclose(eval_a, eval_b)
    assert not np.allclose(a, eval_a)


def test_jit_forward_static_mdef():
    mdef, params = build()
    x, y, mask, idx = make_batch()
    jitted = jax.jit(lambda p, x, m, i: score(p, mdef, x, m, i))
    s1 = np.asarray(jitted(params, x, mask, idx))
    s2 = np.asarray(score(params, mdef, x, mask, idx))
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)


def test_bf16_compute_close_to_f32():
    mdef, params = build()
    x, y, mask, idx = make_batch()
    f32 = np.asarray(score(params, mdef, x, mask, idx))
    bf16 = np.asarray(score(params, mdef, x, mask, idx, compute_dtype=jnp.bfloat16))
    assert bf16.dtype == np.float32
    np.testing.assert_allclose(f32, bf16, rtol=0.1, atol=0.05)


def test_num_params_counts_everything():
    mdef, params = build({"transformer": None,
                          "post_model": {"output_activation": None, "d_output": 1}})
    # fc: 10*16 + 16; output: 16*1 + 1
    assert num_params(params) == 10 * 16 + 16 + 16 + 1


def test_sigmoid_head_outputs_probabilities():
    mdef, params = build()
    x, y, mask, idx = make_batch()
    out = np.asarray(forward(params, mdef, x, mask, idx))
    assert (out >= 0).all() and (out <= 1).all()
