"""Fine-grained budget of the flagship train step (B=64, L=240, bf16).

Measures each REAL component of the jitted step — the megakernel sublayers
(not the XLA fallbacks roofline.py's sublayer rows time), the encoder glue
(positional encoding + final LN), the FC tower, the loss chain, and the
optimizer — as self-feeding scan chains, so their sum can be compared to
the measured full step and the residual identifies schedule/dispatch waste.

Usage: python tools/exp_step_budget.py [B] [L]
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench_util import time_steps  # noqa: E402

BF16 = jnp.bfloat16


def measure(step_fn, state, label, repeat=16):
    def scanned(st):
        return jax.lax.scan(lambda c, _: (step_fn(c), None), st,
                            None, length=repeat)[0]

    jitted = jax.jit(scanned)

    def once(st):
        st = jitted(st)
        leaf = jax.tree.leaves(st)[0]
        return st, leaf.reshape(-1)[0].astype(np.float32)

    dt, _ = time_steps(once, state, n1=5, n2=20, repeats=3)
    print(f"{label:<44} {dt / repeat * 1e3:8.3f} ms", flush=True)
    return dt / repeat


def main():
    from __graft_entry__ import _example_batch, _flagship_mdef
    from allrank_tpu.data.batching import SlateBatch
    from allrank_tpu.losses import get_loss
    from allrank_tpu.models.factory import forward, init_params
    from allrank_tpu.models.transformer import (
        _mega_ffn_runner,
        _mega_sublayer_runner,
        transformer_apply,
    )
    from allrank_tpu.training import make_optimizer
    from allrank_tpu.training.train_utils import make_train_step

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    F = 136

    mdef = _flagship_mdef(F)
    tdef = mdef.transformer
    d = tdef.d_model
    params = init_params(jax.random.PRNGKey(0), mdef)
    optimizer = make_optimizer("Adam", {"lr": 1e-3})
    opt_state = optimizer.init(params)
    loss_fn, needs_rng = get_loss("lambdaLoss")
    largs = {"weighing_scheme": "ndcgLoss2PP_scheme", "mu": 10.0}
    train_step = make_train_step(mdef, loss_fn, largs, needs_rng, optimizer,
                                 None, "bfloat16")
    x, y, indices, _ = _example_batch(B, L, F)
    y[:, -40:] = -1.0
    indices[:, -40:] = -1
    batch = jax.device_put(SlateBatch(x, y, indices, np.ones(B, dtype=bool)))
    mask = jnp.asarray(np.asarray(y) == -1.0)

    # ---- full step --------------------------------------------------------
    def full_step(st):
        p, o, r = st
        p, o, r, loss, _ = train_step(p, o, r, batch)
        return (p, o, r)

    t_full = measure(full_step, (params, opt_state, jax.random.PRNGKey(1)),
                     "full train step", repeat=8)

    bparams = jax.tree.map(
        lambda a: a.astype(BF16) if a.dtype == jnp.float32 else a, params
    )
    tparams = bparams["transformer"]
    h0 = jnp.asarray(np.random.RandomState(0).randn(B, L, d), dtype=BF16)
    idx = jnp.asarray(indices)

    # ---- encoder x4 fwd + bwd(x AND params) --------------------------------
    def enc_step(st):
        h, tp = st

        def f(hh, pp):
            out = transformer_apply(pp, tdef, hh, mask, idx, train=True,
                                    rng=None)
            return jnp.sum(out.astype(jnp.float32))

        gh, gp = jax.grad(f, argnums=(0, 1))(h, tp)
        tp2 = jax.tree.map(lambda a, g: a - BF16(1e-6) * g.astype(a.dtype),
                           tp, gp)
        return (h + BF16(1e-6) * gh, tp2)

    t_enc = measure(enc_step, (h0, tparams), "encoder x4 fwd+bwd(all grads)")

    lp = tparams["layers"][0]
    mega = _mega_sublayer_runner(L, B, tdef)
    mega_ffn = _mega_ffn_runner(L, B, tdef)
    seeds = jnp.zeros((2,), dtype=jnp.int32)

    # ---- one mega attention sublayer fwd+bwd -------------------------------
    def attn_step(st):
        h, p = st

        def f(hh, pp):
            return jnp.sum(mega(pp, hh, mask, seeds, 0.0, 0.0)
                           .astype(jnp.float32))

        gh, gp = jax.grad(f, argnums=(0, 1))(h, p)
        p2 = jax.tree.map(lambda a, g: a - BF16(1e-6) * g.astype(a.dtype),
                          p, gp)
        return (h + BF16(1e-6) * gh, p2)

    t_attn = measure(attn_step, (h0, lp), "mega attn sublayer x1 fwd+bwd")

    # ---- one mega FFN sublayer fwd+bwd -------------------------------------
    def ffn_step(st):
        h, p = st

        def f(hh, pp):
            return jnp.sum(mega_ffn(pp, hh, seeds, 0.0, 0.0)
                           .astype(jnp.float32))

        gh, gp = jax.grad(f, argnums=(0, 1))(h, p)
        p2 = jax.tree.map(lambda a, g: a - BF16(1e-6) * g.astype(a.dtype),
                          p, gp)
        return (h + BF16(1e-6) * gh, p2)

    t_ffn = measure(ffn_step, (h0, lp), "mega ffn sublayer x1 fwd+bwd")

    # ---- forward-only encoder ----------------------------------------------
    def enc_fwd(h):
        out = transformer_apply(tparams, tdef, h, mask, idx, train=True,
                                rng=None)
        return h + BF16(1e-6) * out

    measure(enc_fwd, h0, "encoder x4 forward only")

    # ---- full model fwd+bwd (tower incl. FC + output) ----------------------
    xb = jnp.asarray(x)

    def tower_step(st):
        p = st

        def f(pp):
            scores = forward(pp, mdef, xb, mask, idx, train=True,
                             rng=None, compute_dtype=jnp.bfloat16)
            return jnp.sum(scores.astype(jnp.float32))

        gp = jax.grad(f)(p)
        return jax.tree.map(lambda a, g: a - 1e-6 * g.astype(a.dtype), p, gp)

    t_tower = measure(tower_step, params, "full tower fwd+bwd(params)")

    # ---- loss chain ---------------------------------------------------------
    y_dev = jnp.asarray(y)
    s0 = jnp.asarray(np.random.RandomState(1).randn(B, L), dtype=jnp.float32)

    def loss_step(s):
        g = jax.grad(lambda ss: loss_fn(ss, y_dev, **largs))(s)
        return s + 1e-6 * g

    t_loss = measure(loss_step, s0, "lambdaLoss[2pp] fwd+bwd", repeat=32)

    # ---- Adam update --------------------------------------------------------
    gfake = jax.tree.map(lambda a: a * 1e-3, params)

    def adam_step(st):
        p, o = st
        updates, o = optimizer.update(gfake, o, p)
        import optax

        p = optax.apply_updates(p, updates)
        return (p, o)

    t_adam = measure(adam_step, (params, opt_state), "Adam update", repeat=32)

    print("-" * 56)
    per_block = t_attn + t_ffn
    print(f"{'4 x (attn+ffn) sublayers':<44} {4 * per_block * 1e3:8.3f} ms")
    print(f"{'encoder glue (enc - 4x sublayers)':<44} "
          f"{(t_enc - 4 * per_block) * 1e3:8.3f} ms")
    print(f"{'tower glue (tower - enc)':<44} "
          f"{(t_tower - t_enc) * 1e3:8.3f} ms")
    print(f"{'step glue (full - tower - loss - adam)':<44} "
          f"{(t_full - t_tower - t_loss - t_adam) * 1e3:8.3f} ms")


def bisect_glue():
    """Measure the PE apply and final-LN pieces of the encoder glue alone."""
    from __graft_entry__ import _example_batch, _flagship_mdef
    from allrank_tpu.models.core import std_layer_norm_apply
    from allrank_tpu.models.positional import fixed_pe_apply
    from allrank_tpu.models.transformer import transformer_init

    B, L, F = 64, 240, 136
    mdef = _flagship_mdef(F)
    tdef = mdef.transformer
    d = tdef.d_model
    tparams = jax.tree.map(
        lambda a: a.astype(BF16) if a.dtype == jnp.float32 else a,
        transformer_init(jax.random.PRNGKey(0), tdef),
    )
    x, y, indices, _ = _example_batch(B, L, F)
    y[:, -40:] = -1.0
    indices[:, -40:] = -1
    mask = jnp.asarray(np.asarray(y) == -1.0)
    idx = jnp.asarray(indices)
    h0 = jnp.asarray(np.random.RandomState(0).randn(B, L, d), dtype=BF16)

    def pe_step(h):
        def f(hh):
            return jnp.sum(fixed_pe_apply(tparams["pe"], hh, mask, idx)
                           .astype(jnp.float32))

        return h + BF16(1e-6) * jax.grad(f)(h)

    measure(pe_step, h0, "fixed PE fwd+bwd(x)")

    def ln_step(st):
        h, p = st

        def f(hh, pp):
            return jnp.sum(std_layer_norm_apply(pp, hh).astype(jnp.float32))

        gh, gp = jax.grad(f, argnums=(0, 1))(h, p)
        p2 = jax.tree.map(lambda a, g: a - BF16(1e-6) * g.astype(a.dtype),
                          p, gp)
        return (h + BF16(1e-6) * gh, p2)

    measure(ln_step, (h0, tparams["final_ln"]), "final LN fwd+bwd")


if __name__ == "__main__":
    # GLUE=1 runs ONLY the glue bisect; default runs the full step budget
    if os.environ.get("GLUE"):
        bisect_glue()
    else:
        main()
