"""Ring attention over the slate axis: sequence-parallel masked attention.

Completes the long-slate story (reference behavior: subsample to a trainable
length, allrank/data/dataset_loading.py:61-79): the soft-sort losses already
shard the O(L²) work over the mesh's ``sequence`` axis
(ops/soft_sort.soft_sort_contract_sp); this module does the same for the
encoder's self-attention, so the whole O(L²) compute of a step scales with
the sequence-axis size instead of riding one chip.

Design (the standard ring-attention schedule, TPU-idiomatic):
  * Q, K, V and the key padding mask are sharded along L over the
    ``sequence`` mesh axis (and along batch over ``data`` when divisible) —
    each device holds [B, h, L/P, ·] blocks only.
  * P ring steps: each device contracts its resident Q block against the
    currently-held K/V block with an online-softmax accumulator (running
    row max ``m``, normalizer ``l``, and context ``acc``), then passes the
    K/V block (and its mask slice) to the next device with
    ``lax.ppermute`` — collectives ride ICI, compute overlaps naturally.
  * Masking uses the same finite ``NEG_INF_FILL`` as the XLA/einsum path
    (models/transformer.py), so fully-padded slates stay NaN-free and the
    sharded result matches the unsharded one to fp32 reassociation noise.
  * Attention dropout is applied to the (unnormalized) probabilities,
    inverted-scaled, with a key folded from (q-shard, global kv-block), so
    masks are deterministic given the rng, decorrelated across ring steps
    and shards, and independent of how the ring is laid out.

The scan/ppermute schedule is reverse-differentiable as plain JAX; the
backward pass re-runs the ring in the transposed direction automatically.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from allrank_tpu.constants import NEG_INF_FILL

F32 = jnp.float32

# Below this slate length a single device's fused/XLA attention is faster
# than paying P ring hops; the sequence axis still helps the O(L²) losses.
RING_ATTENTION_MIN_LEN = 1024


def _ring_body(q, k, v, key_mask, rng, *, p_drop, seq_axis, batch_axis=None):
    """shard_map body. q,k,v: [B, h, Lq, dh] local blocks; key_mask: [B, Lq]
    local slice (True = padded). Returns the local context block."""
    n_dev = jax.lax.axis_size(seq_axis)
    my = jax.lax.axis_index(seq_axis)
    if p_drop > 0.0 and batch_axis is not None:
        # the rng arrives replicated over the data axis: fold the data-shard
        # index in so same-local-index slates on different shards draw
        # independent dropout masks (matches the fused/tiled kernel paths)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(batch_axis))
    d_k = q.shape[-1]
    qf = q.astype(F32) / math.sqrt(d_k)

    # the online-softmax carry becomes axis-varying through the ring; mark
    # the constant seeds varying so scan carry types are stable and the vma
    # checker can verify the body (shard_map check_vma=True below)
    vary_axes = ((seq_axis,) if batch_axis is None
                 else (batch_axis, seq_axis))
    m0 = jax.lax.pcast(jnp.full(q.shape[:3], -jnp.inf, dtype=F32),
                       vary_axes, to="varying")            # [B, h, Lq]
    l0 = jax.lax.pcast(jnp.zeros(q.shape[:3], dtype=F32),
                       vary_axes, to="varying")
    acc0 = jax.lax.pcast(jnp.zeros(q.shape, dtype=F32),
                         vary_axes, to="varying")          # [B, h, Lq, dh]
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

    def step(carry, t):
        m, l, acc, k_blk, v_blk, mask_blk = carry
        # device ``my`` holds global kv block (my - t) mod P at step t
        blk_id = jax.lax.rem(my - t + n_dev, n_dev)

        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_blk.astype(F32))
        s = jnp.where(mask_blk[:, None, None, :], NEG_INF_FILL, s)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)                        # exp(-inf)=0 at t=0
        p = jnp.exp(s - m_new[..., None])                 # [B, h, Lq, Lk]
        l = l * alpha + jnp.sum(p, axis=-1)

        if p_drop > 0.0:
            key = jax.random.fold_in(jax.random.fold_in(rng, my), blk_id)
            keep = jax.random.bernoulli(key, 1.0 - p_drop, p.shape)
            p = jnp.where(keep, p / (1.0 - p_drop), 0.0)

        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(F32))

        k_blk, v_blk, mask_blk = jax.lax.ppermute(
            (k_blk, v_blk, mask_blk), seq_axis, perm)
        return (m_new, l, acc, k_blk, v_blk, mask_blk), None

    (m, l, acc, _, _, _), _ = jax.lax.scan(
        step, (m0, l0, acc0, k, v, key_mask), jnp.arange(n_dev))
    return (acc / l[..., None]).astype(q.dtype)


def ring_slate_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray,
    mesh,
    seq_axis: str,
    *,
    p_drop: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Sequence-parallel masked slate attention.

    q, k, v: [B, h, L, d_head] (replicated or already L-sharded — shard_map
    partitions them along L over ``mesh[seq_axis]``); key_mask: [B, L] True
    at padded docs. L must divide evenly by the sequence-axis size. Batch
    additionally shards over the data axis when divisible. Same masking
    semantics as the XLA einsum path (finite NEG_INF_FILL: fully-padded
    slates attend uniformly, no NaNs).
    """
    from jax.sharding import PartitionSpec as P

    from allrank_tpu.parallel.mesh import DATA_AXIS

    if p_drop > 0.0 and rng is None:
        raise ValueError("ring attention dropout requires an rng key")
    if rng is None:
        rng = jax.random.PRNGKey(0)  # untouched when p_drop == 0

    batch_axis = (
        DATA_AXIS
        if DATA_AXIS in mesh.shape and q.shape[0] % mesh.shape[DATA_AXIS] == 0
        else None
    )
    qkv_spec = P(batch_axis, None, seq_axis, None)

    def body(q, k, v, key_mask, rng):
        return _ring_body(q, k, v, key_mask, rng, p_drop=p_drop,
                          seq_axis=seq_axis, batch_axis=batch_axis)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, P(batch_axis, seq_axis), P()),
        out_specs=qkv_spec,
        # vma-checked since round 5 (carry seeds pcast to varying in
        # _ring_body); a replication regression fails loud at trace time
        check_vma=True,
    )(q, k, v, key_mask, rng)
