"""Randomized differential fuzz of the MODEL layer: the full tower
(input-norm -> FC -> PE -> pre-norm transformer -> head) against an
independent float64 numpy reference, across random architectures, shapes,
and padding patterns — L=1, h=1, single-real-doc and ALL-padded slates,
multi-output heads, out-of-range rank indices. Complements the loss/metric
fuzz (tests/losses/test_fuzz_differential.py): the masked static-shape
reformulations of the encoder break (if they break) at exactly these
corners."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from allrank_tpu.config import (
    FCConfig,
    ModelConfig,
    PositionalEncodingConfig,
    PostModelConfig,
    TransformerConfig,
)
from allrank_tpu.constants import NEG_INF_FILL
from allrank_tpu.models.factory import init_params, make_model, score

ACTS = {"ReLU": lambda x: np.maximum(x, 0.0),
        "Tanh": np.tanh,
        "Sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
        None: lambda x: x}


def _np_torch_layer_norm(x, scale, bias, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return scale * (x - mean) / np.sqrt(var + eps) + bias


def _np_std_layer_norm(x, scale, bias, eps=1e-6):
    mean = x.mean(-1, keepdims=True)
    n = x.shape[-1]
    var = ((x - mean) ** 2).sum(-1, keepdims=True) / max(n - 1, 1)
    return scale * (x - mean) / (np.sqrt(np.maximum(var, 1e-24)) + eps) + bias


def _np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _np_forward(params, mdef, x, mask, indices):
    """Independent float64 forward mirroring models/factory.forward
    (train=False)."""
    p = jax.tree.map(lambda a: np.asarray(a, dtype=np.float64), params)
    x = np.asarray(x, dtype=np.float64)

    if mdef.fc:
        fp = p["fc"]
        if mdef.fc.input_norm:
            x = _np_torch_layer_norm(x, fp["input_norm"]["scale"],
                                     fp["input_norm"]["bias"])
        act = ACTS[mdef.fc.activation]
        for layer in fp["layers"]:
            x = act(x @ layer["w"] + layer["b"])

    if mdef.transformer:
        tdef = mdef.transformer
        tp = p["transformer"]
        d, h = tdef.d_model, tdef.h
        dk = d // h
        if tdef.positional_encoding is not None:
            table = np.asarray(tp["pe"]["table"], dtype=np.float64)
            padding_idx = table.shape[0] - 1
            idx = np.where(mask, padding_idx, indices)
            idx = np.minimum(idx, padding_idx)
            x = math.sqrt(d) * x + table[idx]
        for lp in tp["layers"]:
            n = _np_std_layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])
            qkv = n @ lp["qkv"]["w"] + lp["qkv"]["b"]
            q, k, v = np.split(qkv, 3, axis=-1)
            ctx = np.zeros_like(n)
            for i in range(h):
                qi = q[..., i * dk:(i + 1) * dk]
                ki = k[..., i * dk:(i + 1) * dk]
                vi = v[..., i * dk:(i + 1) * dk]
                s = qi @ ki.transpose(0, 2, 1) / math.sqrt(dk)
                s = np.where(mask[:, None, :], float(NEG_INF_FILL), s)
                ctx[..., i * dk:(i + 1) * dk] = _np_softmax(s) @ vi
            x = x + (ctx @ lp["out"]["w"] + lp["out"]["b"])
            n = _np_std_layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"])
            hid = np.maximum(n @ lp["ff1"]["w"] + lp["ff1"]["b"], 0.0)
            x = x + (hid @ lp["ff2"]["w"] + lp["ff2"]["b"])
        x = _np_std_layer_norm(x, tp["final_ln"]["scale"],
                               tp["final_ln"]["bias"])

    out = x @ p["output"]["w"] + p["output"]["b"]
    if mdef.output.d_output == 1:
        out = out.squeeze(-1)
    out = ACTS[mdef.output.output_activation](out)
    if mdef.output.d_output > 1:
        out = out.sum(-1)
    return out


def _random_case(seed):
    rng = np.random.RandomState(seed)
    B = rng.randint(1, 5)
    L = int(rng.choice([1, 2, 3, 7, 12]))
    F = rng.randint(1, 9)
    h = int(rng.choice([1, 2, 4]))
    d = h * int(rng.choice([2, 4, 8]))
    pe = rng.choice([None, "fixed", "learned"])
    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(
                sizes=[int(rng.randint(1, 10)), d],
                input_norm=bool(rng.randint(2)),
                activation=rng.choice(["ReLU", "Tanh", "Sigmoid", None]),
                dropout=0.0),
            transformer=TransformerConfig(
                N=rng.randint(1, 3), d_ff=int(rng.randint(1, 17)), h=h,
                dropout=0.0,
                positional_encoding=(None if pe is None else
                                     PositionalEncodingConfig(
                                         strategy=str(pe),
                                         max_indices=int(rng.randint(2, 30)))),
            ),
            post_model=PostModelConfig(
                d_output=int(rng.choice([1, 3])),
                output_activation=rng.choice(["Sigmoid", None])),
        ), F,
    )
    params = init_params(jax.random.PRNGKey(seed), mdef)

    x = rng.randn(B, L, F).astype(np.float32)
    # padding patterns: none / tail / single-real / ALL padded
    mask = np.zeros((B, L), dtype=bool)
    for b in range(B):
        kind = rng.randint(4)
        if kind == 1 and L > 1:
            mask[b, rng.randint(1, L):] = True
        elif kind == 2:
            mask[b, :] = True
            mask[b, rng.randint(L)] = False
        elif kind == 3:
            mask[b, :] = True  # fully padded slate
    # ranks: realistic, out-of-table, and padded -1
    indices = rng.randint(0, 40, size=(B, L)).astype(np.int32)
    indices[mask] = -1
    return mdef, params, x, mask, indices


@pytest.mark.parametrize("seed", range(30))
def test_score_matches_fp64_reference(seed):
    mdef, params, x, mask, indices = _random_case(seed)
    ref = _np_forward(params, mdef, x, mask, indices)
    got = np.asarray(score(params, mdef, jnp.asarray(x), jnp.asarray(mask),
                           jnp.asarray(indices), train=False))
    assert got.shape == ref.shape
    assert np.isfinite(got).all()
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=5e-4 * scale, rtol=5e-4)
