"""Reference-checkpoint import (allrank_tpu/interop.py).

Builds a synthetic reference-shaped torch state_dict (the exact key/shape
layout the reference's LTRModel produces — reference: allrank/models/model.py,
allrank/models/transformer.py), converts it with
``torch_state_dict_to_params``, and checks the imported model scores
identically to an independent torch forward implementing the reference
semantics (pre-norm residual blocks, unbiased-std LayerNorm, rank-indexed
positional encoding, masked multi-head attention).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from allrank_tpu.config import (  # noqa: E402
    FCConfig,
    ModelConfig,
    PositionalEncodingConfig,
    PostModelConfig,
    TransformerConfig,
)
from allrank_tpu.interop import (  # noqa: E402
    load_torch_state_dict,
    torch_state_dict_to_params,
)
from allrank_tpu.models.factory import make_model, score  # noqa: E402


def _mdef(pe="fixed", d_output=1, output_activation=None, input_norm=True,
          n_features=24, sizes=(32,), N=2, h=2, d_ff=48, max_indices=40):
    return make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=list(sizes), input_norm=input_norm,
                              activation="ReLU", dropout=0.0),
            transformer=TransformerConfig(
                N=N, d_ff=d_ff, h=h,
                positional_encoding=(
                    PositionalEncodingConfig(strategy=pe,
                                             max_indices=max_indices)
                    if pe else None
                ),
                dropout=0.0,
            ),
            post_model=PostModelConfig(d_output=d_output,
                                       output_activation=output_activation),
        ),
        n_features=n_features,
    )


def _fixed_pe_table(d_model, max_len):
    pos = torch.arange(max_len, dtype=torch.float32).unsqueeze(1)
    div = torch.exp(torch.arange(0, d_model, 2, dtype=torch.float32)
                    * (-math.log(10000.0) / d_model))
    pe = torch.zeros(max_len + 1, d_model)
    pe[:max_len, 0::2] = torch.sin(pos * div)
    pe[:max_len, 1::2] = torch.cos(pos * div)
    return pe


def _ref_state_dict(mdef, seed=0):
    """Random tensors in the reference LTRModel's state_dict layout."""
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return 0.2 * torch.randn(*shape, generator=g)

    sd = {}
    dims = (mdef.fc.n_features,) + tuple(mdef.fc.sizes)
    if mdef.fc.input_norm:
        sd["input_layer.input_norm.weight"] = 1.0 + 0.1 * t(dims[0])
        sd["input_layer.input_norm.bias"] = t(dims[0])
    for i in range(len(mdef.fc.sizes)):
        sd[f"input_layer.layers.{i}.weight"] = t(dims[i + 1], dims[i])
        sd[f"input_layer.layers.{i}.bias"] = t(dims[i + 1])

    tdef = mdef.transformer
    d = tdef.d_model
    for i in range(tdef.N):
        for j in range(4):
            sd[f"encoder.layers.{i}.self_attn.linears.{j}.weight"] = t(d, d)
            sd[f"encoder.layers.{i}.self_attn.linears.{j}.bias"] = t(d)
        sd[f"encoder.layers.{i}.feed_forward.w_1.weight"] = t(tdef.d_ff, d)
        sd[f"encoder.layers.{i}.feed_forward.w_1.bias"] = t(tdef.d_ff)
        sd[f"encoder.layers.{i}.feed_forward.w_2.weight"] = t(d, tdef.d_ff)
        sd[f"encoder.layers.{i}.feed_forward.w_2.bias"] = t(d)
        for s in (0, 1):
            sd[f"encoder.layers.{i}.sublayer.{s}.norm.a_2"] = 1.0 + 0.1 * t(d)
            sd[f"encoder.layers.{i}.sublayer.{s}.norm.b_2"] = t(d)
    sd["encoder.norm.a_2"] = 1.0 + 0.1 * t(d)
    sd["encoder.norm.b_2"] = t(d)
    if tdef.positional_encoding == "fixed":
        sd["encoder.position.pe"] = _fixed_pe_table(d, tdef.max_indices)
    elif tdef.positional_encoding == "learned":
        sd["encoder.position.pe.weight"] = t(tdef.max_indices + 1, d)

    sd["output_layer.w_1.weight"] = t(mdef.output.d_output, d)
    sd["output_layer.w_1.bias"] = t(mdef.output.d_output)
    return sd


def _std_ln(x, a, b, eps=1e-6):
    mean = x.mean(-1, keepdim=True)
    std = x.std(-1, keepdim=True)  # unbiased, like the reference
    return a * (x - mean) / (std + eps) + b


def _torch_reference_forward(sd, mdef, x, mask, indices):
    """Independent functional torch forward with the reference's semantics."""
    x = torch.as_tensor(x)
    mask_t = torch.as_tensor(mask)
    idx = torch.as_tensor(np.asarray(indices, dtype=np.int64))

    if mdef.fc.input_norm:
        x = torch.nn.functional.layer_norm(
            x, (x.shape[-1],),
            sd["input_layer.input_norm.weight"],
            sd["input_layer.input_norm.bias"],
        )
    for i in range(len(mdef.fc.sizes)):
        w = sd[f"input_layer.layers.{i}.weight"]
        b = sd[f"input_layer.layers.{i}.bias"]
        x = torch.relu(x @ w.T + b)

    tdef = mdef.transformer
    d, h = tdef.d_model, tdef.h
    d_k = d // h
    if tdef.positional_encoding is not None:
        table = (sd["encoder.position.pe"]
                 if tdef.positional_encoding == "fixed"
                 else sd["encoder.position.pe.weight"])
        pad_row = table.shape[0] - 1
        pidx = idx.masked_fill(mask_t, pad_row).clamp(max=pad_row)
        x = math.sqrt(d) * x + table[pidx]

    bsz, L, _ = x.shape
    for i in range(tdef.N):
        pre = f"encoder.layers.{i}"
        n = _std_ln(x, sd[f"{pre}.sublayer.0.norm.a_2"],
                    sd[f"{pre}.sublayer.0.norm.b_2"])
        q, k, v = (
            (n @ sd[f"{pre}.self_attn.linears.{j}.weight"].T
             + sd[f"{pre}.self_attn.linears.{j}.bias"])
            .view(bsz, L, h, d_k).transpose(1, 2)
            for j in (0, 1, 2)
        )
        scores = q @ k.transpose(-2, -1) / math.sqrt(d_k)
        scores = scores.masked_fill(mask_t[:, None, None, :], -1e9)
        ctx = torch.softmax(scores, dim=-1) @ v
        ctx = ctx.transpose(1, 2).reshape(bsz, L, d)
        x = x + (ctx @ sd[f"{pre}.self_attn.linears.3.weight"].T
                 + sd[f"{pre}.self_attn.linears.3.bias"])
        n = _std_ln(x, sd[f"{pre}.sublayer.1.norm.a_2"],
                    sd[f"{pre}.sublayer.1.norm.b_2"])
        hid = torch.relu(n @ sd[f"{pre}.feed_forward.w_1.weight"].T
                         + sd[f"{pre}.feed_forward.w_1.bias"])
        x = x + (hid @ sd[f"{pre}.feed_forward.w_2.weight"].T
                 + sd[f"{pre}.feed_forward.w_2.bias"])

    x = _std_ln(x, sd["encoder.norm.a_2"], sd["encoder.norm.b_2"])
    out = x @ sd["output_layer.w_1.weight"].T + sd["output_layer.w_1.bias"]
    out = out.squeeze(dim=2) if mdef.output.d_output == 1 else out
    if mdef.output.output_activation == "Sigmoid":
        out = torch.sigmoid(out)
    if mdef.output.d_output > 1:
        out = out.sum(-1)
    return out.numpy()


def _batch(mdef, seed=1, bsz=3, L=17):
    rng = np.random.RandomState(seed)
    x = rng.randn(bsz, L, mdef.fc.n_features).astype(np.float32)
    y = rng.randint(0, 5, size=(bsz, L)).astype(np.float32)
    y[0, -5:] = -1.0
    y[2, -11:] = -1.0
    indices = np.tile(np.arange(L, dtype=np.int32), (bsz, 1))
    indices[y == -1.0] = -1
    mask = y == -1.0
    return x, mask, indices


@pytest.mark.parametrize(
    "pe,d_output,act",
    [("fixed", 1, None), ("learned", 1, None), ("fixed", 4, "Sigmoid")],
)
def test_imported_params_score_matches_torch(pe, d_output, act):
    mdef = _mdef(pe=pe, d_output=d_output, output_activation=act)
    sd = _ref_state_dict(mdef)
    params = torch_state_dict_to_params(sd, mdef)
    x, mask, indices = _batch(mdef)

    ours = np.asarray(score(params, mdef, x, mask, indices))
    theirs = _torch_reference_forward(sd, mdef, x, mask, indices)
    # only non-padded scores matter (the reference never reads padded ones)
    np.testing.assert_allclose(ours[~mask], theirs[~mask], rtol=2e-5, atol=2e-5)


def test_dataparallel_module_prefix_is_stripped():
    mdef = _mdef()
    sd = _ref_state_dict(mdef)
    wrapped = {f"module.{k}": v for k, v in sd.items()}
    a = torch_state_dict_to_params(sd, mdef)
    b = torch_state_dict_to_params(wrapped, mdef)
    for pa, pb in zip(
        [a["output"]["w"], a["transformer"]["layers"][0]["qkv"]["w"]],
        [b["output"]["w"], b["transformer"]["layers"][0]["qkv"]["w"]],
    ):
        np.testing.assert_array_equal(pa, pb)


def test_missing_and_extra_tensors_fail_loudly():
    mdef = _mdef()
    sd = _ref_state_dict(mdef)
    missing = dict(sd)
    del missing["encoder.norm.a_2"]
    with pytest.raises(KeyError, match="encoder.norm.a_2"):
        torch_state_dict_to_params(missing, mdef)

    extra = dict(sd)
    extra["encoder.layers.9.bogus"] = torch.zeros(3)
    with pytest.raises(ValueError, match="unmapped"):
        torch_state_dict_to_params(extra, mdef)

    wrong = dict(sd)
    wrong["output_layer.w_1.weight"] = torch.zeros(7, 7)
    with pytest.raises(ValueError, match="output_layer.w_1.weight"):
        torch_state_dict_to_params(wrong, mdef)


def test_pkl_roundtrip_through_npz(tmp_path):
    """model.pkl -> interop -> model.npz -> checkpoint.load_params."""
    import jax

    from allrank_tpu.models.factory import init_params
    from allrank_tpu.training.checkpoint import load_params, save_params

    mdef = _mdef()
    sd = _ref_state_dict(mdef)
    pkl = tmp_path / "model.pkl"
    torch.save(sd, str(pkl))

    state = load_torch_state_dict(str(pkl))
    params = torch_state_dict_to_params(state, mdef)
    npz = tmp_path / "model.npz"
    save_params(params, str(npz))

    template = init_params(jax.random.PRNGKey(0), mdef)
    loaded = load_params(template, str(npz))

    x, mask, indices = _batch(mdef)
    np.testing.assert_allclose(
        np.asarray(score(loaded, mdef, x, mask, indices)),
        np.asarray(score(params, mdef, x, mask, indices)),
        rtol=1e-6, atol=1e-6,
    )


def test_export_roundtrip_state_dict():
    """sd -> params -> sd recovers every reference tensor exactly."""
    from allrank_tpu.interop import params_to_torch_state_dict

    for pe in ("fixed", "learned"):
        mdef = _mdef(pe=pe)
        sd = _ref_state_dict(mdef)
        params = torch_state_dict_to_params(sd, mdef)
        back = params_to_torch_state_dict(params, mdef)
        assert sorted(back) == sorted(sd)
        for k in sd:
            np.testing.assert_array_equal(back[k], sd[k].numpy(), err_msg=k)


def test_export_of_trained_params_matches_torch_forward():
    """params (as if trained here) -> exported sd: the torch forward of the
    exported state_dict reproduces our scores."""
    import jax

    from allrank_tpu.interop import params_to_torch_state_dict
    from allrank_tpu.models.factory import init_params

    mdef = _mdef(pe="fixed")
    params = init_params(jax.random.PRNGKey(3), mdef)
    sd = {k: torch.as_tensor(np.asarray(v))
          for k, v in params_to_torch_state_dict(params, mdef).items()}
    x, mask, indices = _batch(mdef)
    ours = np.asarray(score(params, mdef, x, mask, indices))
    theirs = _torch_reference_forward(sd, mdef, x, mask, indices)
    np.testing.assert_allclose(ours[~mask], theirs[~mask], rtol=2e-5, atol=2e-5)
