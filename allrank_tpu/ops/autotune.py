"""Per-device-kind dispatch-threshold table (measure once, cache, reuse).

The kernel/XLA dispatch crossovers in this package were measured on one
chip (a tunneled v5e). On a different TPU generation the measured
boundaries can move, silently flipping shapes onto the slower (still
correct — dispatch equivalence is differential-tested) path. This module
makes the thresholds a measured-per-device-kind table:

  * ``get(name)`` — the effective threshold: the cached tuned value for
    THIS device kind when present, else the shipped default (today's
    v5e-measured constants). Every dispatcher reads through this.
  * ``run_autotune()`` — a short probe run (kernel-vs-XLA scan-amortized
    timings at the boundary shapes) that writes the table next to the XLA
    compilation cache (``ALLRANK_TPU_CACHE_DIR``); rerun per new device
    kind: ``python -m allrank_tpu.ops.autotune``. Probes whose kernel path
    cannot run here (non-TPU backend) keep the defaults.

The table is keyed by ``jax.devices()[0].device_kind`` — one tune per
hardware generation, shared by every process on the same cache dir.
Capacity-style caps (VMEM ceilings) are tuned by compile-probing the
boundary, not timing. Beyond-reference: the reference has no dispatch
tiers at all (single torch path).
"""

from __future__ import annotations

import json
import os
from typing import Optional

# Shipped defaults = the round-3/4 v5e measurements. Every name maps to the
# module constant it parameterizes (kept there as documentation):
#   fused_attention_min_len      models/transformer.py FUSED_ATTENTION_MIN_LEN
#   fused_attention_bf16_min_len models/transformer.py FUSED_ATTENTION_BF16_MIN_LEN
#   fused_attention_min_groups   models/transformer.py FUSED_ATTENTION_MIN_GROUPS
#   lambda_pair_crossover_elems  ops/lambda_tiled.py tiled_lambda_preferred
#   ring_attention_min_len       ops/attention_ring.py RING_ATTENTION_MIN_LEN
#   sinkhorn_max_fused_len       ops/soft_sort.py sinkhorn pallas cap
#   neuralsort_max_fused_len     ops/neuralsort_pallas.py MAX_FUSED_LENGTH
#   sp_lambda_min_len            ops/lambda_sp.py sp_lambda_dispatch
DEFAULTS = {
    "fused_attention_min_len": 512,
    "fused_attention_bf16_min_len": 120,
    "fused_attention_min_groups": 256,
    "lambda_pair_crossover_elems": 32 * 1024 * 1024,
    "ring_attention_min_len": 1024,
    "sinkhorn_max_fused_len": 768,
    "neuralsort_max_fused_len": 512,
    "sp_lambda_min_len": 2048,
}

_loaded: Optional[dict] = None  # this-process cache of the tuned table


def cache_dir() -> str:
    return os.environ.get(
        "ALLRANK_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "allrank_tpu_xla"),
    )


def table_path() -> str:
    return os.path.join(cache_dir(), "dispatch_thresholds.json")


def device_key() -> str:
    import jax

    try:
        return str(jax.devices()[0].device_kind)
    except Exception:
        return "unknown"


def _load_table() -> dict:
    global _loaded
    if _loaded is None:
        try:
            with open(table_path()) as f:
                _loaded = json.load(f)
        except (OSError, ValueError):
            _loaded = {}
    return _loaded


def invalidate_cache() -> None:
    """Drop the in-process copy (tests; after run_autotune writes)."""
    global _loaded
    _loaded = None


def get(name: str) -> int:
    """Effective threshold ``name``: tuned value for this device kind if a
    table entry exists, else the shipped default."""
    entry = _load_table().get(device_key())
    if entry and name in entry:
        return int(entry[name])
    return DEFAULTS[name]


def effective() -> dict:
    """The full effective table (for --show / logging)."""
    return {k: get(k) for k in DEFAULTS}


def _write(values: dict) -> str:
    path = table_path()
    os.makedirs(cache_dir(), exist_ok=True)
    table = dict(_load_table())
    table[device_key()] = values
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    invalidate_cache()
    return path


# -- probes -----------------------------------------------------------------


def _time_scan_chain(fn, x, k: int = 8, n: int = 5) -> float:
    """Seconds per fn application, measured as the slope of a K-chained
    lax.scan (the round-4 instrument: dispatch-floor-free, tunnel-safe)."""
    import time

    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(carry, _):
            # cast the carry perturbation to x's dtype: a bf16 probe input
            # must stay bf16 or the crossover is tuned from f32 timings
            out = fn(x + (carry * jnp.float32(1e-30)).astype(x.dtype))
            return jnp.sum(out).astype(jnp.float32), ()

        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return final

    run(x).block_until_ready()  # compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        run(x).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def _probe_attention_crossover(lengths=(120, 176, 240, 368, 512),
                               batch=64, heads=4, d_head=32) -> Optional[int]:
    """Smallest L (bf16, grad chain) where the fused attention kernel beats
    the XLA einsum path; None when the kernel never wins here."""
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from allrank_tpu.constants import NEG_INF_FILL
    from allrank_tpu.ops.attention_pallas import fused_slate_attention

    rng = np.random.RandomState(0)
    win_at = None
    for L in lengths:
        q, k_, v = (jnp.asarray(
            rng.randn(batch, heads, L, d_head).astype(np.float32),
            dtype=jnp.bfloat16) for _ in range(3))
        mask = jnp.zeros((batch, L), dtype=bool)
        seed = jnp.zeros((), dtype=jnp.int32)

        def xla(q):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k_) / math.sqrt(d_head)
            s = jnp.where(mask[:, None, None, :], NEG_INF_FILL, s)
            return jnp.einsum("bhqk,bhkd->bhqd",
                              jax.nn.softmax(s, axis=-1), v)

        def kern(q):
            return fused_slate_attention(q, k_, v, mask, seed, 0.0)

        def grad_of(f):
            g = jax.grad(lambda q: jnp.sum(f(q).astype(jnp.float32)))
            return lambda q: g(q)

        try:
            t_k = _time_scan_chain(grad_of(kern), q)
        except Exception:
            continue  # kernel can't run at this shape on this chip
        t_x = _time_scan_chain(grad_of(xla), q)
        if t_k < t_x:
            win_at = L
            break
    return win_at


def _probe_lambda_crossover(batch=64, lengths=(512, 768, 1024),
                            ) -> Optional[int]:
    """Smallest B*L^2 where the pair-tiled lambda kernel's grad chain beats
    the XLA pair path (ndcgLoss2 weighing); None when it never wins at the
    probed sizes. Paths are forced through the loss's own dispatch seams
    (the square kernel is disabled so the TILED kernel vs XLA boundary is
    what's measured — that is the crossover ``tiled_lambda_preferred``
    encodes)."""
    from unittest import mock

    import jax
    import numpy as np

    from allrank_tpu.losses.lambdaloss import lambdaLoss

    rng = np.random.RandomState(0)
    for L in lengths:
        y_pred = np.asarray(rng.randn(batch, L), dtype=np.float32)
        y_true = np.asarray(rng.randint(0, 5, size=(batch, L)),
                            dtype=np.float32)

        grad = jax.grad(lambda yp: lambdaLoss(
            yp, y_true, weighing_scheme="ndcgLoss2_scheme"))

        def timed(force_tiled: bool):
            with mock.patch("allrank_tpu.ops.lambda_pallas."
                            "lambda_pairs_available", return_value=False), \
                 mock.patch("allrank_tpu.ops.lambda_tiled."
                            "tiled_lambda_preferred",
                            return_value=force_tiled):
                return _time_scan_chain(grad, y_pred)

        try:
            t_k = timed(True)
        except Exception:
            continue  # tiled kernel unavailable at this shape here
        t_x = timed(False)
        if t_k < t_x:
            return batch * L * L
    return None


def run_autotune(verbose: bool = True) -> dict:
    """Measure the timeable crossovers on THIS device kind and persist the
    table. Unprobeable entries keep their defaults."""
    import jax

    values = dict(DEFAULTS)
    if jax.default_backend() == "tpu":
        attn = _probe_attention_crossover()
        if attn is not None:
            values["fused_attention_bf16_min_len"] = attn
        lam = _probe_lambda_crossover()
        if lam is not None:
            values["lambda_pair_crossover_elems"] = lam
    elif verbose:
        print("backend is not tpu: keeping shipped defaults")
    path = _write(values)
    if verbose:
        print(f"device kind: {device_key()}")
        print(json.dumps(values, indent=1, sort_keys=True))
        print(f"wrote {path}")
    return values


def main() -> None:
    from argparse import ArgumentParser

    ap = ArgumentParser("allRank-tpu dispatch-threshold autotune")
    ap.add_argument("--show", action="store_true",
                    help="print the effective table without re-tuning")
    args = ap.parse_args()
    if args.show:
        print(f"device kind: {device_key()}")
        print(json.dumps(effective(), indent=1, sort_keys=True))
        tuned = _load_table().get(device_key())
        print("source:", "tuned table" if tuned else "shipped defaults")
        return
    run_autotune()


if __name__ == "__main__":
    main()
