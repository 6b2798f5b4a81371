"""Quantified roofline for the flagship train step (verdict r2 item 1).

For the headline config (FC[128] + 4-block transformer h=4 d_ff=512,
B=64, L=240, bf16, NDCGLoss2++) this measures each component's step time
and pulls XLA's post-fusion cost analysis (flops + bytes accessed), then
compares against the chip's compute and HBM-bandwidth bounds:

    t_mxu = flops / PEAK_FLOPS      t_hbm = bytes / HBM_BW
    bound = max(t_mxu, t_hbm)       efficiency = bound / measured

Every component is timed as a SELF-FEEDING chain (the output perturbs the
next input) so XLA cannot constant-fold the work or pipeline independent
calls; same discipline as bench.py.

A component at >= 80% of its bound has no headroom left at this shape;
a component far under it is latency/fusion-limited, not bandwidth-limited.

Usage: python tools/roofline.py [B] [L]   (defaults 64 240)
"""

from __future__ import annotations

import os
import sys

import numpy as np

PEAK_FLOPS_BF16 = 197e12   # TPU v5e bf16 matmul peak per chip
HBM_BW = 819e9             # TPU v5e HBM bandwidth (bytes/s)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def jnp_arange(n):
    import jax.numpy as jnp

    return jnp.arange(n, dtype=jnp.int32)


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _measure(step_fn, state, label, repeat=16):
    """step_fn(state) -> state (jittable, self-feeding). The step runs
    ``repeat`` times inside ONE jitted lax.scan so the tunnel's ~1.3 ms
    per-dispatch floor amortizes away (sub-ms components are otherwise
    unmeasurable through the tunnel)."""
    import jax

    from bench_util import time_steps

    def scanned(st):
        # step_fn may take (state, t) — t (the step index) lets it rotate its
        # captured batch so XLA cannot hoist batch-derived work out of the
        # loop (in real training every step sees fresh data)
        import inspect

        takes_t = len(inspect.signature(step_fn).parameters) == 2
        body = (
            (lambda c, t: (step_fn(c, t), None)) if takes_t
            else (lambda c, _: (step_fn(c), None))
        )
        return jax.lax.scan(body, st, jnp_arange(repeat), length=repeat)[0]

    jitted = jax.jit(scanned)
    # XLA cost analysis counts the scan BODY once (trip count is not
    # multiplied in), so flops/bytes are already per-step
    flops, bytes_ = _cost(jitted.lower(state).compile())

    def step_once(st):
        st = jitted(st)
        leaf = jax.tree.leaves(st)[0]
        return st, leaf.reshape(-1)[0].astype(np.float32)

    dt, _ = time_steps(step_once, state, n1=5, n2=20, repeats=3)
    dt /= repeat
    t_mxu = flops / PEAK_FLOPS_BF16
    t_hbm = bytes_ / HBM_BW
    bound = max(t_mxu, t_hbm)
    return {
        "label": label,
        "ms": dt * 1e3,
        "gflop": flops / 1e9,
        "gb": bytes_ / 1e9,
        "t_mxu_ms": t_mxu * 1e3,
        "t_hbm_ms": t_hbm * 1e3,
        "bound_ms": bound * 1e3,
        "bound_kind": "mxu" if t_mxu >= t_hbm else "hbm",
        "pct_of_bound": 100.0 * bound / dt if dt > 0 else 0.0,
    }


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship_mdef
    from allrank_tpu.data.batching import SlateBatch
    from allrank_tpu.losses import get_loss
    from allrank_tpu.models.core import dense_apply, std_layer_norm_apply
    from allrank_tpu.models.factory import init_params
    from allrank_tpu.models.transformer import _attention, transformer_apply
    from allrank_tpu.training import make_optimizer
    from allrank_tpu.training.train_utils import make_train_step

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    F = 136

    mdef = _flagship_mdef(F)
    params = init_params(jax.random.PRNGKey(0), mdef)
    optimizer = make_optimizer("Adam", {"lr": 1e-3})
    opt_state = optimizer.init(params)
    loss_fn, needs_rng = get_loss("lambdaLoss")
    train_step = make_train_step(
        mdef, loss_fn, {"weighing_scheme": "ndcgLoss2PP_scheme", "mu": 10.0},
        needs_rng, optimizer, None, "bfloat16",
    )
    x, y, indices, _ = _example_batch(B, L, F)
    y[:, -40:] = -1.0
    indices[:, -40:] = -1
    batch = jax.device_put(SlateBatch(x, y, indices, np.ones(B, dtype=bool)))

    rows = []

    # ---- full train step (the bench.py loop, verbatim semantics) ---------
    def full_step(st, t):
        p, o, r = st
        b = SlateBatch(
            jnp.roll(batch.x, t, axis=0), jnp.roll(batch.y, t, axis=0),
            jnp.roll(batch.indices, t, axis=0), batch.slate_mask,
        )
        p, o, r, loss, _ = train_step(p, o, r, b)
        return (p, o, r)

    rows.append(_measure(full_step, (params, opt_state, jax.random.PRNGKey(1)),
                         "full train step", repeat=8))

    tdef = mdef.transformer
    d = tdef.d_model
    mask = jnp.asarray(np.asarray(y) == -1.0)
    idx = jnp.ones((B, L), dtype=jnp.int32)
    drop_rng = jax.random.PRNGKey(2)
    tparams = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params["transformer"],
    )
    h0 = jnp.asarray(np.random.RandomState(0).randn(B, L, d),
                     dtype=jnp.bfloat16)

    # ---- encoder x4 fwd+bwd ----------------------------------------------
    def enc_step(h):
        def f(hh):
            out = transformer_apply(tparams, tdef, hh, mask, idx, train=True,
                                    rng=drop_rng)
            return jnp.sum(out.astype(jnp.float32))

        g = jax.grad(f)(h)
        return h + jnp.bfloat16(1e-6) * g

    rows.append(_measure(enc_step, h0, "encoder x4 fwd+bwd"))

    lp = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params["transformer"]["layers"][0],
    )

    # ---- one attention sublayer fwd+bwd ------------------------------------
    def attn_step(h):
        def f(hh):
            normed = std_layer_norm_apply(lp["ln1"], hh)
            out = _attention(lp, tdef, normed, mask, True, drop_rng)
            return jnp.sum(out.astype(jnp.float32))

        g = jax.grad(f)(h)
        return h + jnp.bfloat16(1e-6) * g

    rows.append(_measure(attn_step, h0, "attention sublayer x1 fwd+bwd"))

    # ---- one FFN sublayer fwd+bwd -------------------------------------------
    def ffn_step(h):
        def f(hh):
            normed = std_layer_norm_apply(lp["ln2"], hh)
            hidden = jax.nn.relu(dense_apply(lp["ff1"], normed))
            out = dense_apply(lp["ff2"], hidden)
            return jnp.sum(out.astype(jnp.float32))

        g = jax.grad(f)(h)
        return h + jnp.bfloat16(1e-6) * g

    rows.append(_measure(ffn_step, h0, "ffn sublayer x1 fwd+bwd"))

    # ---- loss chain fwd+bwd ---------------------------------------------------
    y_dev = jnp.asarray(y)
    s0 = jnp.asarray(np.random.RandomState(1).randn(B, L), dtype=jnp.float32)

    def loss_step(s, t):
        y_t = jnp.roll(y_dev, t, axis=0)

        def f(ss):
            return loss_fn(ss, y_t, weighing_scheme="ndcgLoss2PP_scheme",
                           mu=10.0)

        g = jax.grad(f)(s)
        return s + 1e-6 * g

    rows.append(_measure(loss_step, s0, "lambdaLoss[2pp] fwd+bwd", repeat=32))

    hdr = (f"{'component':<32} {'ms':>8} {'GFLOP':>8} {'GB':>7} "
           f"{'t_mxu':>7} {'t_hbm':>7} {'bound':>7} {'kind':>5} {'%bound':>7}")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(f"{r['label']:<32} {r['ms']:>8.3f} {r['gflop']:>8.2f} "
              f"{r['gb']:>7.3f} {r['t_mxu_ms']:>7.3f} {r['t_hbm_ms']:>7.3f} "
              f"{r['bound_ms']:>7.3f} {r['bound_kind']:>5} "
              f"{r['pct_of_bound']:>6.1f}%")


if __name__ == "__main__":
    main()
