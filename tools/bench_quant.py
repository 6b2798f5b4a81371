"""int8 vs bf16 vs fp32 serving throughput across tower widths.

The w8a8 quantized path (quant.py) targets the MXU's int8 rate (2x bf16
peak on v5e). At the paper width (d_model=128) matmuls are a single MXU
tile and the step is latency-bound — the dynamic-quantization VPU work
(per-row absmax/round) can cost more than the int8 matmuls save. This
sweep measures where the crossover sits by scaling the tower (d_ff =
4*d_model, d_head=32) at the serve shape B=64, L=240.

Interleaved same-session A/B (mode-major rounds, min-of-rounds) — the
tunneled chip drifts ±30% between arms measured minutes apart.

Usage: python tools/bench_quant.py [--sizes 128,512,1024] [--batch 64]
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
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    from allrank_tpu.config import (
        FCConfig,
        ModelConfig,
        PositionalEncodingConfig,
        PostModelConfig,
        TransformerConfig,
    )
    from allrank_tpu.models.factory import init_params, make_model
    from allrank_tpu.serving import make_scorer
    from tools.bench_util import time_steps

    B, L, F = args.batch, args.slate, args.features
    print(f"device: {jax.devices()[0].device_kind}, B={B}, L={L}, F={F}")
    print(f"\n{'d_model':>8} {'mode':>9} {'ms/call':>9} {'slates/s':>10} "
          f"{'vs bf16':>8}")

    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randn(B, L, F).astype(np.float32))
    lengths = jax.device_put(
        rng.randint(L // 2, L + 1, size=B).astype(np.int32))

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
        scorers = {
            "float32": make_scorer(params, mdef, "float32"),
            "bfloat16": make_scorer(params, mdef, "bfloat16"),
            "int8": make_scorer(params, mdef, quantize="int8"),
        }

        best = {}
        for _ in range(args.rounds):  # interleave modes within each round
            for mode, scorer in scorers.items():
                def step(state):
                    s = scorer(x, lengths)
                    return state, s[0, 0]

                sec, _ = time_steps(step, None)
                best[mode] = min(best.get(mode, float("inf")), sec)
        for mode in ("float32", "bfloat16", "int8"):
            sec = best[mode]
            rel = best["bfloat16"] / sec
            print(f"{d:>8} {mode:>9} {sec * 1e3:>9.3f} {B / sec:>10,.0f} "
                  f"{rel:>7.2f}x")


if __name__ == "__main__":
    main()
