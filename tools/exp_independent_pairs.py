"""Dependency-bubble probe (round 4, follows tools/exp_chain_sweep.py).

The chained attn+ffn pair costs 517 us (fwd+bwd slope, K-sweep) vs ~345 us
as isolated kernels — is the +0.17 ms a DEPENDENCY bubble (each kernel
waits on its predecessor's output; launch/fill cannot overlap), or do the
kernels just cost more in any real composition?

Probe: K INDEPENDENT pair-chains per scan iteration (separate inputs, no
cross dependencies). If the per-pair slope drops toward the isolated sum,
the bubbles are real and fillable — and unrolled 2-way gradient
accumulation (two independent half-batch tower chains per optimizer step)
becomes a throughput candidate. If the slope stays ~517 us, the chain
number is just what the kernels cost, and the isolated baseline was the
artifact.

Usage: python tools/exp_independent_pairs.py [B] [L]
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

from exp_chain_sweep import fit, measure  # noqa: E402

BF16 = jnp.bfloat16


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    d = 128

    from allrank_tpu.config import (FCConfig, ModelConfig, PostModelConfig,
                                    TransformerConfig)
    from allrank_tpu.models.factory import init_params, make_model
    from allrank_tpu.models.transformer import (_mega_ffn_runner,
                                                _mega_sublayer_runner)

    mdef = make_model(ModelConfig(
        fc_model=FCConfig(sizes=[d], input_norm=False, activation=None,
                          dropout=None),
        transformer=TransformerConfig(N=8, d_ff=512, h=4,
                                      positional_encoding=None,
                                      dropout=0.0),
        post_model=PostModelConfig(d_output=1)), d)
    tdef = mdef.transformer
    params = init_params(jax.random.PRNGKey(0), mdef)
    bparams = jax.tree.map(
        lambda a: a.astype(BF16) if a.dtype == jnp.float32 else a, params)
    layers = bparams["transformer"]["layers"]
    mega = _mega_sublayer_runner(L, B, tdef)
    mega_ffn = _mega_ffn_runner(L, B, tdef)
    assert mega is not None and mega_ffn is not None
    mask = jnp.zeros((B, L), dtype=bool)
    seeds = jnp.zeros((2,), dtype=jnp.int32)
    rs = np.random.RandomState(0)

    def pair_fwd_bwd(i, hh):
        def f(h_in):
            h = mega(layers[i], h_in, mask, seeds, 0.0, 0.0)
            h = mega_ffn(layers[i], h, seeds, 0.0, 0.0)
            return jnp.sum(h.astype(jnp.float32))

        return hh + BF16(1e-6) * jax.grad(f)(hh)

    Ks = [1, 2, 4, 8]

    # independent: K separate inputs, K pair-chains with NO cross deps
    xs = tuple(jnp.asarray(rs.randn(B, L, d) * 0.1, dtype=BF16)
               for _ in range(8))
    ts = []
    for k in Ks:
        def body(st, k=k):
            return tuple(pair_fwd_bwd(i, st[i]) for i in range(k)) + st[k:]
        ts.append(measure(body, xs, f"INDEPENDENT pairs fwd+bwd x{k}"))
    fit(Ks, ts, "independent pairs (fwd+bwd)")

    # dependent chain re-measured same-session for the A/B
    ts = []
    for k in Ks:
        def body(st, k=k):
            hh = st[0]
            for i in range(k):
                hh = pair_fwd_bwd(i, hh)
            return (hh,) + st[1:]
        ts.append(measure(body, xs, f"CHAINED pairs fwd+bwd x{k}"))
    fit(Ks, ts, "chained pairs (fwd+bwd)")


if __name__ == "__main__":
    main()
