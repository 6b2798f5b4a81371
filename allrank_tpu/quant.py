"""Post-training int8 quantization for the serving path (w8a8).

The reference has no quantization story at all (torch fp32 end-to-end);
this is a beyond-reference production-serving feature designed for the
TPU's native int8 MXU rate (2x the bf16 peak on v5e-class chips).

Two activation-quantization modes share the int8-weight scheme:

  * **dynamic** (``quantize="int8"``): per-row (per document) activation
    scales computed on the fly from each row's absmax — no calibration
    data needed. Round-4 measurement showed the per-row absmax reduce +
    rank-1 dequant outer product cost more VPU time than the int8 MXU
    rate returns (BENCHMARKS.md "honest non-win").
  * **static** (``quantize="int8_static"``): per-tensor activation scales
    measured ONCE by a calibration pass (``calibrate_activations`` runs N
    representative batches through the fp32 tower and records each matmul
    input's absmax). At serve time the quantize step is a constant
    multiply+round+clip (no reduction), and the dequant collapses to a
    single precomputed ``[d_out]`` column scale (``x_scale * w_scale``)
    that XLA fuses into the matmul epilogue with the bias add — the
    per-row VPU chain the dynamic mode pays is gone.

Weight scheme (both modes): symmetric per-output-channel int8
(``w_q[i, j] = round(w[i, j] / s_j)``, ``s_j = max_i |w[i, j]| / 127``),
quantized ONCE at model-load time; matmuls run ``int8 x int8 -> int32``
on the MXU (``preferred_element_type=int32``).

What stays in float: LayerNorms, softmax/attention probabilities, positional
encodings, residual adds, activations between layers (quantization error
does not accumulate across layers — every quantized matmul re-reads a fresh
fp32 activation), and biases. Only the six matmul families carry int8:
FC-tower layers, fused QKV, attention out-projection, FFN up/down, and the
output head.

Eval-only by design: this path serves ``make_scorer(quantize=...)``;
training keeps full precision.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from allrank_tpu.constants import NEG_INF_FILL
from allrank_tpu.models.core import get_activation, layer_norm_apply, std_layer_norm_apply
from allrank_tpu.models.factory import LTRModelDef
from allrank_tpu.models.positional import fixed_pe_apply, learned_pe_apply

F32 = jnp.float32
I8 = jnp.int8
I32 = jnp.int32
_QMAX = 127.0
_TINY = 1e-30  # absmax floor: all-zero rows quantize to zeros, not NaN

# Adaptive granularity for static activation scales: a calibrated site
# whose per-channel absmax spread (max/median) is at most this collapses
# to ONE per-tensor scale — the quietest channel then loses at most
# log2(4)=2 bits, measured quality-neutral, while sites with genuine
# outlier channels (fc input at corpus scale: 29x) keep the per-channel
# migration. Perf reason to prefer scalar where it's free: the attention
# out-projection's input is a Pallas-kernel output through a
# transpose+reshape, and a channel-wise broadcast there defeats XLA's
# copy-fusion (+3 ms/call measured at d=1024, BENCHMARKS round-5); with
# realistic spreads (/out <= 2.7) those sites collapse and the cost
# vanishes.
PER_CHANNEL_SPREAD_THRESHOLD = 4.0


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
    """``x @ w + b`` with int8-quantized ``x`` and pre-quantized ``w``;
    returns fp32. ``x``: [..., d_in] float.

    Static mode (``"x_inv_scale"`` present, from ``quantize_model_static``):
    the activation quantize is a constant scalar multiply + round/clip (no
    per-row reduction) and dequant+bias is one fused ``[d_out]`` epilogue.
    Dynamic mode otherwise: per-row absmax scale, rank-1 dequant."""
    if "x_inv_scale" in qp:  # static (calibrated) activation scale
        # dtype-preserving: a bf16 activation flow reads half the HBM bytes
        # through the quantize pass (computed in fp32 registers — XLA fuses
        # the upcast+scale+round+clip into one pass) and the epilogue casts
        # back, so LN/residuals between quantized matmuls stay bf16
        in_dtype = x.dtype
        x_q = jnp.clip(jnp.round(x.astype(F32) * qp["x_inv_scale"]),
                       -_QMAX, _QMAX).astype(I8)
        acc = jax.lax.dot_general(
            x_q, qp["w_q"],
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=I32,
        )
        out = acc.astype(F32) * qp["out_scale"] + qp["b"]
        return out.astype(in_dtype)
    x = x.astype(F32)
    xs = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), _TINY) / _QMAX
    x_q = jnp.clip(jnp.round(x / xs), -_QMAX, _QMAX).astype(I8)
    acc = jax.lax.dot_general(
        x_q, qp["w_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=I32,
    )
    return acc.astype(F32) * xs * qp["w_scale"] + qp["b"]


def quantize_model(params: dict, mdef: LTRModelDef,
                   act_scales: dict | None = None) -> dict:
    """Quantize every matmul weight in an LTR model's param tree; float
    parameters (LayerNorms, PE tables, biases) pass through unchanged.

    With ``act_scales`` (a site -> activation-absmax dict from
    ``calibrate_activations``) each dense additionally carries a static
    per-tensor activation scale: ``x_inv_scale`` (the serve-time quantize
    multiplier) and ``out_scale = x_scale * w_scale`` (the fused dequant
    epilogue column scale) — q_dense_apply then takes the static path."""

    def qd(site: str, p: dict) -> dict:
        if act_scales is None:
            return quantize_dense(p)
        if site not in act_scales:
            raise KeyError(
                f"calibration has no activation scale for site '{site}' "
                f"(have: {sorted(act_scales)}) — calibrate with the same "
                "model definition")
        cal = np.asarray(act_scales[site], dtype=np.float32)
        w = jnp.asarray(p["w"], dtype=F32)
        if cal.ndim == 1 and cal.shape[0] != w.shape[0]:
            raise ValueError(
                f"calibration for site '{site}' has {cal.shape[0]} channels "
                f"but the weight expects {w.shape[0]} — act_scales.json from "
                "a different model definition?")
        if cal.ndim == 1:
            spread = float(cal.max() / max(float(np.median(cal)), _TINY))
            if spread <= PER_CHANNEL_SPREAD_THRESHOLD:
                cal = cal.max()  # uniform channels: per-tensor is free
        if cal.ndim == 0:  # per-tensor (legacy calibration or collapsed)
            s_x = max(float(cal), _TINY) / _QMAX
            qp = quantize_dense(p)
            qp["x_inv_scale"] = jnp.asarray(1.0 / s_x, dtype=F32)
            qp["out_scale"] = (s_x * qp["w_scale"]).astype(F32)
            return qp
        # per-channel calibration with scale MIGRATION (SmoothQuant-style):
        # divide each input channel by its calibrated absmax and fold that
        # factor into the weights BEFORE weight quantization — channels
        # with outlier magnitudes (post-LN feature spikes at corpus scale)
        # no longer starve every other channel's int8 resolution. The
        # serve-time quantize stays ONE fused multiply (a [d_in] vector
        # instead of a scalar); the epilogue is unchanged.
        s_chan = jnp.maximum(jnp.asarray(cal, dtype=F32), _TINY)  # [d_in]
        w_mig = w * s_chan[:, None]
        s_w = jnp.maximum(jnp.max(jnp.abs(w_mig), axis=0), _TINY) / _QMAX
        w_q = jnp.clip(jnp.round(w_mig / s_w), -_QMAX, _QMAX).astype(I8)
        # x/s_chan has per-channel max 1 by construction -> s_x = 1/QMAX
        return {"w_q": w_q, "w_scale": s_w,
                "b": jnp.asarray(p["b"], dtype=F32),
                "x_inv_scale": (_QMAX / s_chan).astype(F32),
                "out_scale": (s_w / _QMAX).astype(F32)}

    q: dict = {}
    if mdef.fc:
        q["fc"] = {"layers": [qd(f"fc/{i}", p)
                              for i, p in enumerate(params["fc"]["layers"])]}
        if mdef.fc.input_norm:
            q["fc"]["input_norm"] = params["fc"]["input_norm"]
    if mdef.transformer:
        layers = []
        for i, lp in enumerate(params["transformer"]["layers"]):
            layers.append({
                "qkv": qd(f"t{i}/qkv", lp["qkv"]),
                "out": qd(f"t{i}/out", lp["out"]),
                "ff1": qd(f"t{i}/ff1", lp["ff1"]),
                "ff2": qd(f"t{i}/ff2", lp["ff2"]),
                "ln1": lp["ln1"],
                "ln2": lp["ln2"],
            })
        q["transformer"] = {"layers": layers,
                            "final_ln": params["transformer"]["final_ln"]}
        if "pe" in params["transformer"]:
            q["transformer"]["pe"] = params["transformer"]["pe"]
    q["output"] = qd("output", params["output"])
    return q


def calibrate_activations(params, mdef: LTRModelDef, batches) -> dict:
    """Calibration pass for static activation scales: run representative
    ``(x [B, L, F], lengths [B])`` batches through the **fp32** tower and
    record, per quantized-matmul site, the running PER-INPUT-CHANNEL
    absmax of that matmul's input activation. Returns
    ``{site: [absmax_per_channel]}`` (python lists — JSON serializable, so
    a service can persist its calibration next to the checkpoint). Feed
    the result to ``quantize_model(..., act_scales=...)``, which migrates
    each channel's scale into the weights (SmoothQuant-style) — at corpus
    scale post-LN activations have per-channel outlier magnitudes that a
    single per-tensor scale cannot survive (measured: a 127x fc-input
    spike cost 4.5 ndcg points; per-channel migration restores the fp32
    gates — tests/test_quant.py, BENCHMARKS round-5).

    Uses serve-time semantics: padding mask from ``lengths``, rank index 1
    (serving.py), eval mode. Calibrate on batches drawn from the traffic
    you will serve — the train split works."""

    def capture_dense(site: str, p: dict, xin: jnp.ndarray) -> jnp.ndarray:
        chan = jnp.max(jnp.abs(xin.astype(F32)),
                       axis=tuple(range(xin.ndim - 1)))  # [d_in]
        cap[site] = (jnp.maximum(cap[site], chan) if site in cap else chan)
        return xin.astype(F32) @ p["w"] + p["b"]

    @jax.jit
    def one_batch(x, lengths):
        positions = jnp.arange(x.shape[1], dtype=jnp.int32)[None, :]
        mask = positions >= lengths[:, None].astype(jnp.int32)
        indices = jnp.ones(x.shape[:2], dtype=jnp.int32)
        quantized_forward(params, mdef, x, mask, indices,
                          dense_fn=capture_dense)
        return cap

    out: dict = {}
    for x, lengths in batches:
        cap = {}
        got = jax.device_get(one_batch(jnp.asarray(x, dtype=F32),
                                       jnp.asarray(lengths, dtype=jnp.int32)))
        for site, v in got.items():
            prev = out.get(site)
            vec = np.asarray(v, dtype=np.float64)
            out[site] = (vec if prev is None
                         else np.maximum(prev, vec))
    return {site: [float(x) for x in v] for site, v in out.items()}


def calibration_batches_from_dataset(ds, slate_length: int,
                                     batch_size: int = 64,
                                     n_batches: int = 8):
    """First ``n_batches`` serve-style ``(x, lengths)`` calibration batches
    from a SlateDataset (deterministic order, no shuffle) — the bridge from
    the data layer to ``calibrate_activations`` used by the evaluate and
    serve CLIs."""
    from allrank_tpu.constants import PADDED_Y_VALUE
    from allrank_tpu.data.batching import SlateBatcher

    out = []
    for batch in SlateBatcher(ds, slate_length, batch_size, shuffle=False):
        lengths = (batch.y != PADDED_Y_VALUE).sum(axis=1).astype("int32")
        # batch-padding dummy slates have zero real docs; serve-time lengths
        # are >= 1, so clamp (their all-zero features barely move absmax)
        out.append((batch.x, lengths.clip(min=1)))
        if len(out) >= n_batches:
            break
    return out


def quantized_bytes(qparams: dict) -> int:
    """Total parameter bytes of a quantized tree (int8 weights + fp32 rest)."""
    return sum(leaf.size * leaf.dtype.itemsize
               for leaf in jax.tree.leaves(qparams))


def _default_dense(site: str, p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return q_dense_apply(p, x)


def _q_attention(lp: dict, tdef, x, key_mask, dense_fn=_default_dense,
                 site: str = "t"):
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
    qkv = dense_fn(site + "/qkv", lp["qkv"], x)  # [B, L, 3d] f32
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
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d).astype(x.dtype)
        return dense_fn(site + "/out", lp["out"], ctx)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d_k)
    scores = jnp.where(key_mask[:, None, None, :], NEG_INF_FILL, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, d)
    return dense_fn(site + "/out", lp["out"], ctx)


def quantized_forward(qparams: dict, mdef: LTRModelDef, x: jnp.ndarray,
                      mask: jnp.ndarray, indices: jnp.ndarray,
                      dense_fn=_default_dense,
                      compute_dtype=F32) -> jnp.ndarray:
    """Eval-mode full model through the quantized tower: [B, L, d_output]
    squeezed to [B, L] when d_output == 1 — mirrors models/factory.py
    ``forward`` (train=False) with every dense matmul routed through
    ``dense_fn(site, layer_params, x)`` (default: ``q_dense_apply``; the
    calibration pass substitutes a float matmul that records each site's
    activation absmax). ``compute_dtype`` sets the elementwise flow
    BETWEEN quantized matmuls (LN/residuals/activations) — bfloat16 halves
    their HBM traffic; the output head and scores stay fp32."""
    x = x.astype(compute_dtype)
    if mdef.fc:
        fcp = qparams["fc"]
        if mdef.fc.input_norm:
            x = layer_norm_apply(fcp["input_norm"], x)
        act = get_activation(mdef.fc.activation)
        for i, layer in enumerate(fcp["layers"]):
            x = act(dense_fn(f"fc/{i}", layer, x))
    if mdef.transformer:
        tdef = mdef.transformer
        tp = qparams["transformer"]
        if tdef.positional_encoding == "fixed":
            x = fixed_pe_apply(tp["pe"], x, mask, indices)
        elif tdef.positional_encoding == "learned":
            x = learned_pe_apply(tp["pe"], x, mask, indices)
        for i, lp in enumerate(tp["layers"]):
            normed = std_layer_norm_apply(lp["ln1"], x)
            x = x + _q_attention(lp, tdef, normed, mask, dense_fn, f"t{i}")
            normed = std_layer_norm_apply(lp["ln2"], x)
            x = x + dense_fn(
                f"t{i}/ff2", lp["ff2"],
                jax.nn.relu(dense_fn(f"t{i}/ff1", lp["ff1"], normed)))
        x = std_layer_norm_apply(tp["final_ln"], x)
    out = dense_fn("output", qparams["output"], x.astype(F32))
    if mdef.output.d_output == 1:
        out = jnp.squeeze(out, axis=2)
    return get_activation(mdef.output.output_activation)(out)


def quantized_score(qparams: dict, mdef: LTRModelDef, x: jnp.ndarray,
                    mask: jnp.ndarray, indices: jnp.ndarray,
                    compute_dtype=F32) -> jnp.ndarray:
    """Eval-mode per-document scores [B, L] through the quantized tower;
    multi-output heads sum over d_output exactly like factory ``score``."""
    out = quantized_forward(qparams, mdef, x, mask, indices,
                            compute_dtype=compute_dtype)
    if mdef.output.d_output > 1:
        out = jnp.sum(out, axis=-1)
    return out
