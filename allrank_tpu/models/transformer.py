"""Slate Transformer encoder (reference: allrank/models/transformer.py:18-247;
paper: "Context-Aware Learning to Rank with Self-Attention", arXiv 2005.10084).

Pre-norm residual blocks over the slate axis with padding-masked self
attention. TPU-first choices:
  * fused QKV projection (one [d, 3d] matmul feeding the MXU instead of three
    [d, d] ones) + einsum attention — same math as the reference's 4-linear
    layout, better MXU utilization;
  * key masking via a large-negative fill (bf16-safe, no NaN rows for fully
    padded slates) instead of -inf;
  * the whole encoder is shape-static and jit-compiles to one XLA program.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from allrank_tpu.constants import NEG_INF_FILL
from allrank_tpu.models.core import (
    dense_apply,
    dense_init,
    dropout,
    layer_norm_init,
    std_layer_norm_apply,
    xavier_uniform,
)
from allrank_tpu.models.positional import (
    fixed_pe_apply,
    fixed_pe_init,
    learned_pe_apply,
    learned_pe_init,
)


@dataclass(frozen=True)
class TransformerDef:
    N: int
    d_model: int
    d_ff: int
    h: int
    dropout: float
    positional_encoding: Optional[str] = None  # None | "fixed" | "learned"
    max_indices: int = 5000

    def __post_init__(self):
        if self.d_model % self.h != 0:
            raise ValueError(
                f"d_model ({self.d_model}) must be divisible by h ({self.h})"
            )


def _layer_init(key: jax.Array, tdef: TransformerDef) -> dict:
    k_qkv, k_out, k_ff1, k_ff2 = jax.random.split(key, 4)
    d = tdef.d_model
    return {
        "qkv": {
            # three Xavier [d, d] blocks fused on the output axis, so fan
            # statistics match the reference's separate projections
            "w": jnp.concatenate(
                [xavier_uniform(k, (d, d)) for k in jax.random.split(k_qkv, 3)], axis=1
            ),
            "b": jnp.zeros((3 * d,)),
        },
        "out": dense_init(k_out, d, d),
        "ff1": dense_init(k_ff1, d, tdef.d_ff),
        "ff2": dense_init(k_ff2, tdef.d_ff, d),
        "ln1": layer_norm_init(d),
        "ln2": layer_norm_init(d),
    }


def transformer_init(key: jax.Array, tdef: TransformerDef) -> dict:
    keys = jax.random.split(key, tdef.N + 2)
    params = {
        "layers": [_layer_init(keys[i], tdef) for i in range(tdef.N)],
        "final_ln": layer_norm_init(tdef.d_model),
    }
    if tdef.positional_encoding == "fixed":
        params["pe"] = fixed_pe_init(tdef.d_model, tdef.max_indices)
    elif tdef.positional_encoding == "learned":
        params["pe"] = learned_pe_init(keys[-1], tdef.d_model, tdef.max_indices)
    return params


# Fused-attention dispatch policy (measured scan-amortized grad chains,
# tools/bench_attention.py --scan; the tunnel's ~1.3 ms dispatch floor
# corrupts unamortized timings):
#   * L >= 512: the kernel wins regardless of dtype/batch — the
#     materialized [B, h, L, L] tensors dominate the XLA path's HBM traffic
#     (2.8x at L=512 B=64 bf16).
#   * 120 <= L < 512: the kernel wins for bf16 once enough slate-head rows
#     feed the grid (1.5-1.7x at the paper shape L=240 B=64 h=4, i.e.
#     g=256 rows; XLA stays faster below ~g=128 and for fp32).
#   * L < 120: XLA (the [L, L] tiles are too small to amortize the kernel).
# Above MAX_LEN a single head's [L, L] probability tile exceeds the VMEM
# budget and the K-tiled online-softmax kernel (ops/attention_tiled.py)
# takes over; both kernels apply attention dropout in-kernel via the
# on-core PRNG.
FUSED_ATTENTION_MIN_LEN = 512
FUSED_ATTENTION_BF16_MIN_LEN = 120
FUSED_ATTENTION_MIN_GROUPS = 256
FUSED_ATTENTION_MAX_LEN = 1224
TILED_ATTENTION_MAX_LEN = 8192

# Whole-sublayer megakernel (ops/attention_block.py) dispatch: LN + QKV +
# MHA + out-proj + dropout + residual in ONE Pallas program per slate
# block. Measured 1.8-2.0x vs the XLA sublayer at the paper shape
# (B=64, L=240, d=128: 0.25 vs 0.50 ms fwd+bwd incl. all weight grads) —
# a bare attention kernel only TIES there because XLA hides the softmax's
# VPU work under the adjacent projection matmuls, which an opaque custom
# call cannot overlap; fusing the entire sublayer removes the competition.
# Envelope: compile-verified to L=768 at d=128 (scoped-VMEM bound above);
# small batches (b*h < 256 slate-head rows) stay on XLA, which wins there.
MEGA_SUBLAYER_MIN_LEN = 120
MEGA_SUBLAYER_MAX_LEN = 768
MEGA_SUBLAYER_MAX_WIDTH = 256


def _min_groups() -> int:
    """Effective b*h dispatch floor — reads the per-device-kind autotune
    table so a tuned ``fused_attention_min_groups`` moves the megakernel
    gates together with the bare-kernel policy (``_kernel_beats_xla``)."""
    from allrank_tpu.ops import autotune

    return autotune.get("fused_attention_min_groups")


def _mega_sublayer_runner(slate_length: int, batch: int, tdef):
    """Dispatch for the fused attention sublayer; None -> XLA path."""
    if jax.default_backend() != "tpu":
        return None
    if not (MEGA_SUBLAYER_MIN_LEN <= slate_length <= MEGA_SUBLAYER_MAX_LEN):
        return None
    if tdef.d_model > MEGA_SUBLAYER_MAX_WIDTH or tdef.d_model % tdef.h:
        return None

    from allrank_tpu.ops.attention_block import attention_sublayer
    from allrank_tpu.parallel.mesh import DATA_AXIS, ambient_mesh
    from jax.sharding import PartitionSpec as P

    h = tdef.h
    phys = ambient_mesh()
    if phys is None or DATA_AXIS not in phys.shape or batch % phys.shape[DATA_AXIS]:
        if jax.device_count() != 1:
            return None
        if batch * h < _min_groups():
            return None

        def direct(lp, x, key_mask, seeds, p_attn, p_resid):
            return attention_sublayer(
                x, key_mask, lp["ln1"]["scale"], lp["ln1"]["bias"],
                lp["qkv"]["w"], lp["qkv"]["b"], lp["out"]["w"],
                lp["out"]["b"], seeds, h, p_attn, p_resid,
            )

        return direct

    n_data = phys.shape[DATA_AXIS]
    if (batch // n_data) * h < _min_groups():
        return None

    def sharded(lp, x, key_mask, seeds, p_attn, p_resid):
        def body(x, m, s, g, b, wq, bq, wo, bo):
            # de-correlate per-shard dropout streams (same rationale and
            # stride as the bare-kernel runner below)
            s = s + jax.lax.axis_index(DATA_AXIS).astype(jnp.int32) \
                * jnp.int32(999999937)
            return attention_sublayer(x, m, g, b, wq, bq, wo, bo, s, h,
                                      p_attn, p_resid)

        return jax.shard_map(
            body, mesh=phys,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P(), P(), P(), P(),
                      P(), P()),
            out_specs=P(DATA_AXIS),
            # pallas body: no vma info; replication structure pinned by
            # tests/ops/test_vma_canary.py::test_attention_sublayer_...
            check_vma=False,
        )(x, key_mask, seeds, lp["ln1"]["scale"], lp["ln1"]["bias"],
          lp["qkv"]["w"], lp["qkv"]["b"], lp["out"]["w"], lp["out"]["b"])

    return sharded


# Whole-encoder megakernel (ops/encoder_block.py): all N blocks + the final
# LayerNorm in one kernel pair. MEASURED NEGATIVE at flagship scale, so OFF
# by default: chained per-sublayer launches looked ~35 us/boundary more
# expensive than their isolated times (16 boundaries/step), but fusing the
# whole encoder into one kernel pair only reached parity in isolation
# (2.14 vs 2.13 ms fwd+bwd) — the in-kernel lax.fori_loop over blocks
# (required: a python unroll holds every block's [bb, L, L] transients
# simultaneously and overflows scoped VMEM 2.4x) costs as much scheduling
# freedom as the boundaries cost launches — and regressed the full train
# step 2.42 -> 3.18 ms. Kept (correctness-tested, incl. exact dropout
# replay parity) for re-evaluation at other shapes / future Mosaic
# versions; flip this flag to re-enable dispatch.
MEGA_ENCODER_ENABLED = False


def _mega_encoder_runner(slate_length: int, batch: int, tdef):
    """Dispatch for the whole-encoder megakernel; None -> per-sublayer
    megakernels (or the XLA path)."""
    if not MEGA_ENCODER_ENABLED or jax.default_backend() != "tpu":
        return None
    if not (MEGA_SUBLAYER_MIN_LEN <= slate_length <= MEGA_SUBLAYER_MAX_LEN):
        return None
    if tdef.d_model > MEGA_SUBLAYER_MAX_WIDTH or tdef.d_model % tdef.h:
        return None
    if tdef.d_ff > 1024 or tdef.N < 1:
        return None

    from allrank_tpu.ops.encoder_block import encoder_forward, vmem_ok
    from allrank_tpu.parallel.mesh import DATA_AXIS, ambient_mesh
    from jax.sharding import PartitionSpec as P

    if not vmem_ok(slate_length, tdef.d_model, tdef.d_ff, tdef.N):
        return None
    h = tdef.h

    def flat_weights(params):
        """The 12 per-block weight stacks ([N, ...] leading axis) the
        kernel's fori_loop indexes, in encoder_block.STACKED_PER_BLOCK
        order."""
        layers = params["layers"]

        def stk(*path):
            leaves = [lp[path[0]][path[1]] for lp in layers]
            return jnp.stack(leaves)

        return (stk("ln1", "scale"), stk("ln1", "bias"), stk("qkv", "w"),
                stk("qkv", "b"), stk("out", "w"), stk("out", "b"),
                stk("ln2", "scale"), stk("ln2", "bias"), stk("ff1", "w"),
                stk("ff1", "b"), stk("ff2", "w"), stk("ff2", "b"))

    phys = ambient_mesh()
    if (phys is None or DATA_AXIS not in phys.shape
            or batch % phys.shape[DATA_AXIS]):
        if jax.device_count() != 1:
            return None
        if batch * h < _min_groups():
            return None

        def direct(params, x, key_mask, seeds, p_drop):
            return encoder_forward(
                x, key_mask, seeds, flat_weights(params),
                params["final_ln"]["scale"], params["final_ln"]["bias"],
                h=h, p_drop=p_drop,
            )

        return direct

    n_data = phys.shape[DATA_AXIS]
    if (batch // n_data) * h < _min_groups():
        return None

    def sharded(params, x, key_mask, seeds, p_drop):
        ws = flat_weights(params) + (params["final_ln"]["scale"],
                                     params["final_ln"]["bias"])

        def body(x, m, s, *w):
            # de-correlate per-shard dropout streams (same stride as the
            # sublayer runners)
            s = s + jax.lax.axis_index(DATA_AXIS).astype(jnp.int32) \
                * jnp.int32(999999937)
            return encoder_forward(x, m, s, w[:-2], w[-2], w[-1], h=h,
                                   p_drop=p_drop)

        return jax.shard_map(
            body, mesh=phys,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()) + (P(),) * len(ws),
            out_specs=P(DATA_AXIS),
            # pallas body: no vma info; replication structure pinned by
            # tests/ops/test_vma_canary.py::test_attention_sublayer_...
            check_vma=False,
        )(x, key_mask, seeds, *ws)

    return sharded


def _kernel_beats_xla(slate_length: int, shard_batch: int, heads: int,
                      dtype) -> bool:
    """The measured dispatch policy above, per data shard. The boundary
    constants read through the per-device-kind autotune table
    (ops/autotune.py) — the module constants above are the shipped
    (v5e-measured) defaults."""
    from allrank_tpu.ops import autotune

    if not (autotune.get("fused_attention_bf16_min_len") <= slate_length
            <= TILED_ATTENTION_MAX_LEN):
        return False
    if slate_length >= autotune.get("fused_attention_min_len"):
        return True
    return (dtype == jnp.bfloat16
            and shard_batch * heads
            >= autotune.get("fused_attention_min_groups"))


def _mega_ffn_runner(slate_length: int, batch: int, tdef):
    """Dispatch for the fused FFN sublayer (ops/ffn_block.py); None -> XLA.
    Same envelope/policy as the attention megakernel — once that kernel is
    in, the FFN must fuse too or its HBM traffic is exposed (the XLA
    scheduler can no longer hide it under the attention matmuls)."""
    if jax.default_backend() != "tpu":
        return None
    if not (MEGA_SUBLAYER_MIN_LEN <= slate_length <= MEGA_SUBLAYER_MAX_LEN):
        return None
    if tdef.d_model > MEGA_SUBLAYER_MAX_WIDTH or tdef.d_ff > 1024:
        return None

    from allrank_tpu.ops.ffn_block import ffn_sublayer
    from allrank_tpu.parallel.mesh import DATA_AXIS, ambient_mesh
    from jax.sharding import PartitionSpec as P

    phys = ambient_mesh()
    if phys is None or DATA_AXIS not in phys.shape or batch % phys.shape[DATA_AXIS]:
        if jax.device_count() != 1:
            return None
        if batch * tdef.h < _min_groups():
            return None

        def direct(lp, x, seeds, p_hidden, p_resid):
            return ffn_sublayer(
                x, lp["ln2"]["scale"], lp["ln2"]["bias"], lp["ff1"]["w"],
                lp["ff1"]["b"], lp["ff2"]["w"], lp["ff2"]["b"], seeds,
                p_hidden, p_resid,
            )

        return direct

    n_data = phys.shape[DATA_AXIS]
    if (batch // n_data) * tdef.h < _min_groups():
        return None

    def sharded(lp, x, seeds, p_hidden, p_resid):
        def body(x, s, g, b, w1, b1, w2, b2):
            s = s + jax.lax.axis_index(DATA_AXIS).astype(jnp.int32) \
                * jnp.int32(999999937)
            return ffn_sublayer(x, g, b, w1, b1, w2, b2, s, p_hidden,
                                p_resid)

        return jax.shard_map(
            body, mesh=phys,
            in_specs=(P(DATA_AXIS), P(), P(), P(), P(), P(), P(), P()),
            out_specs=P(DATA_AXIS),
            # pallas body: no vma info; replication structure pinned by
            # tests/ops/test_vma_canary.py::test_attention_sublayer_...
            check_vma=False,
        )(x, seeds, lp["ln2"]["scale"], lp["ln2"]["bias"], lp["ff1"]["w"],
          lp["ff1"]["b"], lp["ff2"]["w"], lp["ff2"]["b"])

    return sharded


def _fused_attention_runner(slate_length: int, batch: int, p_drop: float,
                            heads: int = 1, dtype=jnp.float32):
    """Returns a wrapper that runs the appropriate fused attention for the
    device context (directly on one chip, per-shard via shard_map over the
    data axis on meshes), or None when the XLA path should be used."""
    if jax.default_backend() != "tpu":
        return None
    if slate_length > FUSED_ATTENTION_MAX_LEN:
        from allrank_tpu.ops.attention_tiled import tiled_slate_attention

        base = tiled_slate_attention
    else:
        from allrank_tpu.ops.attention_pallas import fused_slate_attention

        base = fused_slate_attention

    from allrank_tpu.parallel.mesh import DATA_AXIS, ambient_mesh
    from jax.sharding import PartitionSpec as P

    phys = ambient_mesh()
    if phys is None or DATA_AXIS not in phys.shape or batch % phys.shape[DATA_AXIS]:
        # no usable mesh context: direct call on a single chip (mesh
        # contexts of any size, incl. 1-device, take the shard_map branch —
        # the same code path that runs on pods)
        if jax.device_count() != 1:
            return None
        return base if _kernel_beats_xla(slate_length, batch, heads,
                                         dtype) else None
    if not _kernel_beats_xla(slate_length, batch // phys.shape[DATA_AXIS],
                             heads, dtype):
        return None

    def sharded(q, k, v, key_mask, seed, p_drop):
        def body(q, k, v, m, s):
            # de-correlate per-shard dropout: the seed arrives replicated, so
            # without mixing in the shard index every data shard would draw
            # identical attention-dropout masks for same-local-index slates.
            # The shard stride must differ from the kernels' per-program
            # stride (1000003) or (shard, program) pairs with equal index
            # sums would collide onto the same PRNG stream.
            s = s + jax.lax.axis_index(DATA_AXIS).astype(jnp.int32) * jnp.int32(999999937)
            return base(q, k, v, m, s, p_drop)

        return jax.shard_map(
            body,
            mesh=phys,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P()),
            out_specs=P(DATA_AXIS),
            # pallas body: no vma info; replication structure pinned by
            # tests/ops/test_vma_canary.py::test_attention_sublayer_...
            check_vma=False,
        )(q, k, v, key_mask, seed)

    return sharded


def _attention(lp: dict, tdef: TransformerDef, x, key_mask, train, rng):
    b, l, d = x.shape
    h, d_k = tdef.h, tdef.d_model // tdef.h

    qkv = dense_apply(lp["qkv"], x)  # [B, L, 3d]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, h, d_k)
    k = k.reshape(b, l, h, d_k)
    v = v.reshape(b, l, h, d_k)

    p_drop = float(tdef.dropout) if (train and tdef.dropout > 0.0) else 0.0

    from allrank_tpu.ops import autotune
    from allrank_tpu.ops.attention_ring import ring_slate_attention
    from allrank_tpu.ops.soft_sort import sequence_parallel_mesh

    sp = sequence_parallel_mesh(l)
    if sp is not None and l >= autotune.get("ring_attention_min_len"):
        # slate-axis-sharded ring attention: each sequence shard holds
        # [B, h, L/P, ·] and K/V blocks rotate over ICI (ppermute)
        mesh, axis = sp
        ctx = ring_slate_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), key_mask, mesh, axis,
            p_drop=p_drop, rng=rng if p_drop > 0.0 else None,
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d).astype(x.dtype)
        return dense_apply(lp["out"], ctx)

    fused = _fused_attention_runner(l, b, p_drop, heads=h, dtype=x.dtype)
    if fused is not None:
        seed = (
            jax.random.randint(rng, (), 0, 2**31 - 1, dtype=jnp.int32)
            if (p_drop > 0.0 and rng is not None)
            else jnp.zeros((), dtype=jnp.int32)
        )
        ctx = fused(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), key_mask, seed, p_drop,
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d).astype(x.dtype)
        return dense_apply(lp["out"], ctx)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d_k)
    scores = jnp.where(key_mask[:, None, None, :], NEG_INF_FILL, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    if p_drop > 0.0:
        probs = dropout(rng, probs, tdef.dropout, train)

    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, d)
    return dense_apply(lp["out"], ctx)


def transformer_apply(
    params: dict,
    tdef: TransformerDef,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    indices: jnp.ndarray,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """x: [B, L, d_model]; mask: [B, L] True at padded docs; indices: [B, L]."""
    if tdef.positional_encoding == "fixed":
        x = fixed_pe_apply(params["pe"], x, mask, indices)
    elif tdef.positional_encoding == "learned":
        x = learned_pe_apply(params["pe"], x, mask, indices)

    n_rngs = 4 * tdef.N
    rngs = (
        list(jax.random.split(rng, n_rngs))
        if (rng is not None and train and tdef.dropout > 0.0)
        else [None] * n_rngs
    )

    p_drop_active = float(tdef.dropout) if (train and tdef.dropout > 0.0) else 0.0

    def _seed_of(r):
        if p_drop_active > 0.0 and r is not None:
            return jax.random.randint(r, (), 0, 2**31 - 1, dtype=jnp.int32)
        return jnp.zeros((), dtype=jnp.int32)

    enc = _mega_encoder_runner(x.shape[1], x.shape[0], tdef)
    if enc is not None:
        # one kernel pair for the whole encoder (incl. final LN)
        seeds = jnp.stack([_seed_of(r) for r in rngs])
        p_eff = p_drop_active if rngs[0] is not None else 0.0
        return enc(params, x, mask, seeds, p_eff)

    mega = _mega_sublayer_runner(x.shape[1], x.shape[0], tdef)
    mega_ffn = _mega_ffn_runner(x.shape[1], x.shape[0], tdef)

    for i, lp in enumerate(params["layers"]):
        r_attn, r_sub1, r_ff, r_sub2 = rngs[4 * i : 4 * i + 4]
        # pre-norm residual: x + drop(attn(ln(x))), then x + drop(ffn(ln(x)))
        if mega is not None:
            seeds = jnp.stack([_seed_of(r_attn), _seed_of(r_sub1)])
            p_eff = p_drop_active if r_attn is not None else 0.0
            x = mega(lp, x, mask, seeds, p_eff, p_eff)
        else:
            normed = std_layer_norm_apply(lp["ln1"], x)
            attn_out = _attention(lp, tdef, normed, mask, train, r_attn)
            x = x + dropout(r_sub1, attn_out, tdef.dropout, train)

        if mega_ffn is not None:
            seeds = jnp.stack([_seed_of(r_ff), _seed_of(r_sub2)])
            p_eff = p_drop_active if r_ff is not None else 0.0
            x = mega_ffn(lp, x, seeds, p_eff, p_eff)
        else:
            normed = std_layer_norm_apply(lp["ln2"], x)
            hidden = dropout(r_ff, jax.nn.relu(dense_apply(lp["ff1"], normed)), tdef.dropout, train)
            x = x + dropout(r_sub2, dense_apply(lp["ff2"], hidden), tdef.dropout, train)

    return std_layer_norm_apply(params["final_ln"], x)
