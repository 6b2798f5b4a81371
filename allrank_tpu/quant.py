"""Post-training int8 quantization for the serving path (w8a8, dynamic).

The reference has no quantization story at all (torch fp32 end-to-end);
this is a beyond-reference production-serving feature designed for the
TPU's native int8 MXU rate (2x the bf16 peak on v5e-class chips).

Scheme — the standard dynamic w8a8 recipe:
  * weights: symmetric per-output-channel int8
    (``w_q[i, j] = round(w[i, j] / s_j)``, ``s_j = max_i |w[i, j]| / 127``),
    quantized ONCE at model-load time;
  * activations: symmetric per-row (per document) int8 with the scale
    computed on the fly from the row's absmax — no calibration data needed,
    and slate inputs with wildly different feature magnitudes each get
    their own scale;
  * matmul: ``int8 x int8 -> int32`` on the MXU
    (``preferred_element_type=int32``), dequantized by the rank-1 outer
    product of row and column scales, bias added in fp32.

What stays in float: LayerNorms, softmax/attention probabilities, positional
encodings, residual adds, activations between layers (quantization error
does not accumulate across layers — every quantized matmul re-reads a fresh
fp32 activation), and biases. Only the six matmul families carry int8:
FC-tower layers, fused QKV, attention out-projection, FFN up/down, and the
output head.

Eval-only by design: this path serves ``make_scorer(quantize="int8")``;
training keeps full precision.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from allrank_tpu.constants import NEG_INF_FILL
from allrank_tpu.models.core import get_activation, layer_norm_apply, std_layer_norm_apply
from allrank_tpu.models.factory import LTRModelDef
from allrank_tpu.models.positional import fixed_pe_apply, learned_pe_apply

F32 = jnp.float32
I8 = jnp.int8
I32 = jnp.int32
_QMAX = 127.0
_TINY = 1e-30  # absmax floor: all-zero rows quantize to zeros, not NaN


def quantize_dense(dense_params: dict) -> dict:
    """Symmetric per-output-channel int8 quantization of one dense layer.

    ``{"w": [d_in, d_out] f32, "b": [d_out] f32}`` ->
    ``{"w_q": int8, "w_scale": [d_out] f32, "b": f32}``.
    """
    w = jnp.asarray(dense_params["w"], dtype=F32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), _TINY) / _QMAX  # [d_out]
    w_q = jnp.clip(jnp.round(w / s), -_QMAX, _QMAX).astype(I8)
    return {"w_q": w_q, "w_scale": s,
            "b": jnp.asarray(dense_params["b"], dtype=F32)}


def q_dense_apply(qp: dict, x: jnp.ndarray) -> jnp.ndarray:
    """``x @ w + b`` with dynamically int8-quantized ``x`` and pre-quantized
    ``w``; returns fp32. ``x``: [..., d_in] float."""
    x = x.astype(F32)
    xs = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), _TINY) / _QMAX
    x_q = jnp.clip(jnp.round(x / xs), -_QMAX, _QMAX).astype(I8)
    acc = jax.lax.dot_general(
        x_q, qp["w_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=I32,
    )
    return acc.astype(F32) * xs * qp["w_scale"] + qp["b"]


def quantize_model(params: dict, mdef: LTRModelDef) -> dict:
    """Quantize every matmul weight in an LTR model's param tree; float
    parameters (LayerNorms, PE tables, biases) pass through unchanged."""
    q: dict = {}
    if mdef.fc:
        q["fc"] = {"layers": [quantize_dense(p) for p in params["fc"]["layers"]]}
        if mdef.fc.input_norm:
            q["fc"]["input_norm"] = params["fc"]["input_norm"]
    if mdef.transformer:
        layers = []
        for lp in params["transformer"]["layers"]:
            layers.append({
                "qkv": quantize_dense(lp["qkv"]),
                "out": quantize_dense(lp["out"]),
                "ff1": quantize_dense(lp["ff1"]),
                "ff2": quantize_dense(lp["ff2"]),
                "ln1": lp["ln1"],
                "ln2": lp["ln2"],
            })
        q["transformer"] = {"layers": layers,
                            "final_ln": params["transformer"]["final_ln"]}
        if "pe" in params["transformer"]:
            q["transformer"]["pe"] = params["transformer"]["pe"]
    q["output"] = quantize_dense(params["output"])
    return q


def quantized_bytes(qparams: dict) -> int:
    """Total parameter bytes of a quantized tree (int8 weights + fp32 rest)."""
    return sum(leaf.size * leaf.dtype.itemsize
               for leaf in jax.tree.leaves(qparams))


def _q_attention(lp: dict, tdef, x, key_mask):
    """Eval-mode multi-head attention with int8 QKV / out projections. The
    attention core (scores, softmax, context) is activation-activation —
    there is no weight to pre-quantize — so it runs in float: through the
    same fused Pallas kernels the float serving path dispatches (bf16, the
    dtype the kernel policy wins at) when available, falling back to the
    fp32 einsum chain. Same math as models/transformer.py ``_attention``
    with train=False."""
    from allrank_tpu.models.transformer import _fused_attention_runner

    b, l, d = x.shape
    h, d_k = tdef.h, tdef.d_model // tdef.h
    qkv = q_dense_apply(lp["qkv"], x)  # [B, L, 3d] f32
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, h, d_k)
    k = k.reshape(b, l, h, d_k)
    v = v.reshape(b, l, h, d_k)

    fused = _fused_attention_runner(l, b, 0.0, heads=h, dtype=jnp.bfloat16)
    if fused is not None:
        bf = jnp.bfloat16
        ctx = fused(
            q.astype(bf).transpose(0, 2, 1, 3),
            k.astype(bf).transpose(0, 2, 1, 3),
            v.astype(bf).transpose(0, 2, 1, 3),
            key_mask, jnp.zeros((), dtype=jnp.int32), 0.0,
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d).astype(F32)
        return q_dense_apply(lp["out"], ctx)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d_k)
    scores = jnp.where(key_mask[:, None, None, :], NEG_INF_FILL, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, d)
    return q_dense_apply(lp["out"], ctx)


def quantized_forward(qparams: dict, mdef: LTRModelDef, x: jnp.ndarray,
                      mask: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Eval-mode full model through the quantized tower: [B, L, d_output]
    squeezed to [B, L] when d_output == 1 — mirrors models/factory.py
    ``forward`` (train=False) with every dense matmul routed through
    ``q_dense_apply``."""
    x = x.astype(F32)
    if mdef.fc:
        fcp = qparams["fc"]
        if mdef.fc.input_norm:
            x = layer_norm_apply(fcp["input_norm"], x)
        act = get_activation(mdef.fc.activation)
        for layer in fcp["layers"]:
            x = act(q_dense_apply(layer, x))
    if mdef.transformer:
        tdef = mdef.transformer
        tp = qparams["transformer"]
        if tdef.positional_encoding == "fixed":
            x = fixed_pe_apply(tp["pe"], x, mask, indices)
        elif tdef.positional_encoding == "learned":
            x = learned_pe_apply(tp["pe"], x, mask, indices)
        for lp in tp["layers"]:
            normed = std_layer_norm_apply(lp["ln1"], x)
            x = x + _q_attention(lp, tdef, normed, mask)
            normed = std_layer_norm_apply(lp["ln2"], x)
            x = x + q_dense_apply(lp["ff2"], jax.nn.relu(q_dense_apply(lp["ff1"], normed)))
        x = std_layer_norm_apply(tp["final_ln"], x)
    out = q_dense_apply(qparams["output"], x)
    if mdef.output.d_output == 1:
        out = jnp.squeeze(out, axis=2)
    return get_activation(mdef.output.output_activation)(out)


def quantized_score(qparams: dict, mdef: LTRModelDef, x: jnp.ndarray,
                    mask: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Eval-mode per-document scores [B, L] through the quantized tower;
    multi-output heads sum over d_output exactly like factory ``score``."""
    out = quantized_forward(qparams, mdef, x, mask, indices)
    if mdef.output.d_output > 1:
        out = jnp.sum(out, axis=-1)
    return out
