"""Scan-amortized serving-mode comparison: fp32 / bf16 / int8 device time.

Per-call timing of sub-ms scorer programs through the tunnel drifts 2-3x
between processes and can even invert mode orderings (measured — see
BENCHMARKS.md round-4 quantization section). This experiment removes the
dispatch term entirely: each mode's scorer runs K=8 times inside ONE
lax.scan dispatch, chained by a numerically-invisible data dependence
(x + 1e-30 * prev_score, preventing XLA from hoisting the loop-invariant
body), so the slope IS device compute. Modes are interleaved round-robin
with min-of-rounds.

Usage: python tools/exp_quant_chain.py [--sizes 128,512,1024] [--k 8]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="128,512,1024")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--slate", type=int, default=240)
    ap.add_argument("--features", type=int, default=136)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from allrank_tpu.config import (
        FCConfig,
        ModelConfig,
        PositionalEncodingConfig,
        PostModelConfig,
        TransformerConfig,
    )
    from allrank_tpu.models.factory import init_params, make_model, score
    from allrank_tpu.quant import (calibrate_activations, quantize_model,
                                   quantized_score)
    from tools.bench_util import time_steps

    B, L, F, K = args.batch, args.slate, args.features, args.k
    print(f"device: {jax.devices()[0].device_kind}, B={B}, L={L}, F={F}, "
          f"chain K={K}")
    print(f"\n{'d_model':>8} {'mode':>11} {'ms/call':>9} {'slates/s':>10} "
          f"{'vs f32':>7}")

    rng = np.random.RandomState(0)
    x_host = rng.randn(B, L, F).astype(np.float32)
    lengths_host = rng.randint(L // 2, L + 1, size=B).astype(np.int32)
    lengths = jax.device_put(lengths_host)
    x_dev = jax.device_put(x_host)

    for d in [int(s) for s in args.sizes.split(",")]:
        mdef = make_model(
            ModelConfig(
                fc_model=FCConfig(sizes=[d], input_norm=True,
                                  activation="ReLU", dropout=None),
                transformer=TransformerConfig(
                    N=4, d_ff=4 * d, h=max(1, d // 32), dropout=0.0,
                    positional_encoding=PositionalEncodingConfig(
                        strategy="fixed", max_indices=L + 1),
                ),
                post_model=PostModelConfig(d_output=1),
            ), F,
        )
        params = init_params(jax.random.PRNGKey(0), mdef)
        qparams = quantize_model(params, mdef)
        scales = calibrate_activations(params, mdef, [(x_host, lengths_host)])
        qparams_s = quantize_model(params, mdef, act_scales=scales)
        mask = jnp.arange(L, dtype=jnp.int32)[None, :] >= lengths[:, None]
        indices = jnp.ones((B, L), dtype=jnp.int32)

        def chain(score_once):
            @jax.jit
            def run(x):
                def body(carry, _):
                    # real (but invisible) data dependence on the previous
                    # iteration's score: blocks loop-invariant hoisting
                    xk = x + carry * jnp.float32(1e-30)
                    s = score_once(xk)
                    return jnp.mean(s).astype(jnp.float32), ()

                final, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=K)
                return final

            return run

        runners = {
            "float32": chain(lambda xk: score(
                params, mdef, xk, mask, indices, train=False)),
            "bfloat16": chain(lambda xk: score(
                params, mdef, xk, mask, indices, train=False,
                compute_dtype=jnp.bfloat16)),
            "int8": chain(lambda xk: quantized_score(
                qparams, mdef, xk, mask, indices)),
            "int8_static": chain(lambda xk: quantized_score(
                qparams_s, mdef, xk, mask, indices)),
            "int8_st_bf16": chain(lambda xk: quantized_score(
                qparams_s, mdef, xk, mask, indices,
                compute_dtype=jnp.bfloat16)),
        }

        best = {}
        for _ in range(args.rounds):
            for mode, run in runners.items():
                def step(state):
                    out = run(x_dev)
                    return state, out

                sec, _ = time_steps(step, None, n1=3, n2=10)
                best[mode] = min(best.get(mode, float("inf")), sec / K)
        for mode in ("float32", "bfloat16", "int8", "int8_static",
                     "int8_st_bf16"):
            sec = best[mode]
            rel = best["float32"] / sec
            print(f"{d:>8} {mode:>11} {sec * 1e3:>9.3f} {B / sec:>10,.0f} "
                  f"{rel:>6.2f}x")


if __name__ == "__main__":
    main()
