"""Serving path: low-latency slate scoring + portable model export.

The reference has no serving story (training-only; rank_and_click reloads
checkpoints in-process). For production ranking this module provides:

  * ``make_scorer``      — a jitted, fixed-shape ``(x, lengths) -> scores``
                           function with padding handled from per-slate doc
                           counts (the natural serve-time input; labels don't
                           exist at serving time). ``compute_dtype="bfloat16"``
                           runs the tower at the MXU's full bf16 rate (scores
                           and masking stay fp32).
  * ``make_ranker``      — same, returning the permutation (descending score
                           order with padding last) instead of raw scores.
  * ``make_sharded_scorer`` — the same scorer jitted over a device mesh
                           (batch sharded over ``data``, params replicated /
                           tensor-sharded over ``model``) for pod-scale
                           serving fleets.
  * ``aot_compile``      — ahead-of-time lower+compile for fixed serve shapes:
                           no first-request tracing/compile stall, and the
                           compiled executable reports its cost/memory
                           analysis for capacity planning.
  * ``export_scorer`` /
    ``load_scorer``      — `jax.export` StableHLO serialization: the scorer
                           (architecture + weights baked in) round-trips
                           through a single portable artifact runnable
                           without this package's model code.

As in the reference's inference path, positional encodings see rank index 1
for every document (true ranks are unknown at serve time — reference
allrank/inference/inference_utils.py:48-50).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from allrank_tpu.models.factory import LTRModelDef, score


def _mask_from_lengths(lengths: jnp.ndarray, slate_length: int) -> jnp.ndarray:
    positions = jnp.arange(slate_length, dtype=jnp.int32)[None, :]
    return positions >= lengths[:, None].astype(jnp.int32)


def _check_quantize(quantize, act_scales):
    if quantize not in ("int8", "int8_static"):
        raise ValueError(f"unknown quantize mode '{quantize}' "
                         "(supported: 'int8', 'int8_static')")
    if quantize == "int8_static" and act_scales is None:
        raise ValueError(
            "quantize='int8_static' needs act_scales from "
            "quant.calibrate_activations (run N representative batches "
            "through the fp32 tower first)")


def make_scorer(params, mdef: LTRModelDef, compute_dtype="float32",
                quantize=None, act_scales=None):
    """Jitted ``(x [B, L, F], lengths [B]) -> scores [B, L]``; padded
    positions score -inf (sort-last under any downstream ordering).

    ``quantize="int8"`` runs every tower matmul as dynamic w8a8 int8 on the
    MXU (see quant.py) — weights are quantized once here.
    ``quantize="int8_static"`` additionally needs ``act_scales`` (a
    calibration from ``quant.calibrate_activations``) and serves the
    static-activation-scale tower: no per-row quant/dequant chain. On both
    quant paths ``compute_dtype`` sets the ELEMENTWISE flow between int8
    matmuls (LN/residuals; bfloat16 halves their HBM traffic — the
    production serving default); scores stay fp32."""
    if quantize is not None:
        _check_quantize(quantize, act_scales)
        from allrank_tpu.quant import quantize_model, quantized_score

        q_dtype = jnp.dtype(compute_dtype)
        qparams = quantize_model(
            params, mdef,
            act_scales=act_scales if quantize == "int8_static" else None)

        @jax.jit
        def q_scorer(x, lengths):
            mask = _mask_from_lengths(lengths, x.shape[1])
            indices = jnp.ones(x.shape[:2], dtype=jnp.int32)
            scores = quantized_score(qparams, mdef, x, mask, indices,
                                     compute_dtype=q_dtype)
            return jnp.where(mask, -jnp.inf, scores.astype(jnp.float32))

        return q_scorer

    dtype = jnp.dtype(compute_dtype)

    @jax.jit
    def scorer(x, lengths):
        mask = _mask_from_lengths(lengths, x.shape[1])
        indices = jnp.ones(x.shape[:2], dtype=jnp.int32)
        scores = score(params, mdef, x, mask, indices, train=False,
                       compute_dtype=dtype)
        return jnp.where(mask, -jnp.inf, scores.astype(jnp.float32))

    return scorer


def make_ranker(params, mdef: LTRModelDef, compute_dtype="float32",
                quantize=None, act_scales=None):
    """Jitted ``(x, lengths) -> order [B, L]``: document indices in
    descending score order, padded positions last."""
    scorer = make_scorer(params, mdef, compute_dtype, quantize=quantize,
                         act_scales=act_scales)

    @jax.jit
    def ranker(x, lengths):
        return jnp.argsort(scorer(x, lengths), axis=-1, descending=True,
                           stable=True)

    return ranker


def make_sharded_scorer(params, mdef: LTRModelDef, mesh,
                        compute_dtype="float32", quantize=None,
                        act_scales=None):
    """Pod-scale serving: ``(x, lengths) -> scores`` jitted over a device
    mesh — the batch is sharded across the ``data`` axis and params are
    replicated over ``data`` (tensor-sharded over ``model`` when the mesh
    has one; same layout rules as training, parallel/mesh.py). XLA inserts
    the collectives; per-request math is identical to ``make_scorer``.

    ``quantize="int8"`` serves the w8a8 tower (quant.py); the int8 weights
    (4x smaller than fp32) are replicated over the whole mesh rather than
    tensor-sharded — at serving scale the batch axis is the one that needs
    devices.

    The global batch must be divisible by the mesh's ``data`` axis size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from allrank_tpu.parallel.mesh import DATA_AXIS, param_shardings

    dtype = jnp.dtype(compute_dtype)
    if quantize is not None:
        _check_quantize(quantize, act_scales)
        from allrank_tpu.quant import quantize_model, quantized_score

        q = quantize_model(
            params, mdef,
            act_scales=act_scales if quantize == "int8_static" else None)
        p_shard = jax.tree.map(lambda _: NamedSharding(mesh, P()), q)
        params_on_mesh = jax.device_put(q, p_shard)
    else:
        p_shard = param_shardings(params, mesh)
        params_on_mesh = jax.device_put(params, p_shard)
    data = NamedSharding(mesh, P(DATA_AXIS))

    def _score(p, x, lengths):
        mask = _mask_from_lengths(lengths, x.shape[1])
        indices = jnp.ones(x.shape[:2], dtype=jnp.int32)
        if quantize is not None:
            s = quantized_score(p, mdef, x, mask, indices,
                                compute_dtype=dtype)
        else:
            s = score(p, mdef, x, mask, indices, train=False,
                      compute_dtype=dtype)
        return jnp.where(mask, -jnp.inf, s.astype(jnp.float32))

    jitted = jax.jit(_score, in_shardings=(p_shard, data, data),
                     out_shardings=data)
    n_data = mesh.shape[DATA_AXIS]

    def scorer(x, lengths):
        if x.shape[0] % n_data:
            raise ValueError(
                f"batch {x.shape[0]} not divisible by data axis {n_data}")
        with mesh:
            return jitted(params_on_mesh, x, lengths)

    return scorer


def aot_compile(fn, batch_size: int, slate_length: int, n_features: int):
    """Ahead-of-time compile a scorer/ranker for fixed serve shapes.

    Returns ``(compiled, info)``: ``compiled(x, lengths)`` runs with zero
    tracing on the hot path (first request pays no compile), and ``info``
    carries the executable's XLA ``flops`` and ``bytes`` estimates plus
    ``argument``/``output``/``temp`` buffer sizes for capacity planning.
    """
    x_s = jax.ShapeDtypeStruct((batch_size, slate_length, n_features),
                               jnp.float32)
    l_s = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
    lowerable = fn if hasattr(fn, "lower") else jax.jit(fn)
    compiled = lowerable.lower(x_s, l_s).compile()

    info = {}
    try:  # backend-dependent; analysis is best-effort
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        info["flops"] = float(cost.get("flops", 0.0))
        info["bytes_accessed"] = float(cost.get("bytes accessed", 0.0))
    except Exception:
        pass
    try:
        mem = compiled.memory_analysis()
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes"):
            info[k] = int(getattr(mem, k))
    except Exception:
        pass
    return compiled, info


def export_scorer(params, mdef: LTRModelDef, slate_length: int,
                  n_features: int, path: str, batch_size: int = 64,
                  compute_dtype="float32", quantize=None,
                  act_scales=None) -> str:
    """Serialize the scorer (weights baked in) to a portable StableHLO
    artifact at ``path``. Shapes are fixed at export: [batch_size,
    slate_length, n_features] inputs. ``quantize="int8"`` bakes the w8a8
    tower in — the artifact carries int8 weights (4x smaller);
    ``"int8_static"`` additionally bakes the calibrated activation
    scales (``act_scales``) in."""
    from jax import export as jexport

    scorer = make_scorer(params, mdef, compute_dtype, quantize=quantize,
                         act_scales=act_scales)
    exported = jexport.export(scorer)(
        jax.ShapeDtypeStruct((batch_size, slate_length, n_features),
                             jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
    )
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_scorer(path: str):
    """Load an exported scorer; returns ``(x, lengths) -> scores``."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def scorer(x, lengths):
        return exported.call(x, lengths)

    return scorer
