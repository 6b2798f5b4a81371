"""MFU vs tower size: where does the train step reach the MXU's rate?

The paper tower (d_model=128, h=4, d_ff=512) runs at ~16-18% MFU — its
matmuls are one MXU tile wide, so the step is bound by latency/bandwidth on
tiny operands, not schedulable FLOPs (BENCHMARKS.md "step composition").
This sweep scales the tower (d_model, d_ff = 4*d_model, heads keeping
d_head=32) at the paper batch/slate and reports sustained TFLOP/s and MFU
per size, holding everything else (loss, optimizer, bf16 compute) fixed —
the framework's compute path itself is MXU-efficient once operands are
MXU-shaped.

Usage: python tools/bench_mfu_scaling.py [--sizes 128,256,512,1024]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

PEAK_FLOPS_BF16 = 197e12  # v5e per-chip bf16 matmul peak


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="128,256,512,1024")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--slate", type=int, default=240)
    ap.add_argument("--features", type=int, default=136)
    args = ap.parse_args()

    import jax

    from allrank_tpu.config import (
        FCConfig,
        ModelConfig,
        PositionalEncodingConfig,
        PostModelConfig,
        TransformerConfig,
    )
    from allrank_tpu.data.batching import SlateBatch
    from allrank_tpu.losses import get_loss
    from allrank_tpu.models.factory import init_params, make_model, num_params
    from allrank_tpu.training import make_optimizer
    from allrank_tpu.training.train_utils import make_train_step
    from tools.bench_util import time_steps

    B, L, F = args.batch, args.slate, args.features
    print(f"device: {jax.devices()[0].device_kind}, B={B}, L={L}, F={F}, "
          f"NDCGLoss2++, bf16 tower, full fwd+loss+bwd+Adam")
    print("\nd_model  d_ff   params     ms/step  GFLOP/step  TFLOP/s   MFU")

    rng = np.random.RandomState(0)
    x = rng.randn(B, L, F).astype(np.float32)
    y = rng.randint(0, 5, size=(B, L)).astype(np.float32)
    y[:, -40:] = -1.0
    indices = np.tile(np.arange(L, dtype=np.int32), (B, 1))
    indices[:, -40:] = -1

    for d in [int(s) for s in args.sizes.split(",")]:
        mdef = make_model(
            ModelConfig(
                fc_model=FCConfig(sizes=[d], input_norm=True,
                                  activation="ReLU", dropout=0.0),
                transformer=TransformerConfig(
                    N=4, d_ff=4 * d, h=max(1, d // 32),
                    positional_encoding=PositionalEncodingConfig(
                        strategy="fixed", max_indices=256),
                    dropout=0.0),
                post_model=PostModelConfig(d_output=1),
            ), F,
        )
        params = init_params(jax.random.PRNGKey(0), mdef)
        optimizer = make_optimizer("Adam", {"lr": 1e-3})
        opt_state = optimizer.init(params)
        loss_fn, needs_rng = get_loss("lambdaLoss")
        step = make_train_step(
            mdef, loss_fn,
            {"weighing_scheme": "ndcgLoss2PP_scheme", "mu": 10.0},
            needs_rng, optimizer, None, "bfloat16",
        )
        batch = jax.device_put(SlateBatch(x, y, indices,
                                          np.ones(B, dtype=bool)))
        key = jax.random.PRNGKey(0)

        try:
            cost = step.lower(params, opt_state, key,
                              batch).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
        except Exception:
            flops = float("nan")

        def step_once(state):
            p, o, k = state
            p, o, k, loss, _n = step(p, o, k, batch)
            return (p, o, k), loss

        sec, _ = time_steps(step_once, (params, opt_state, key))
        tflops = flops / sec / 1e12
        print(f"{d:<8} {4 * d:<6} {num_params(params):>9,} "
              f"{sec * 1e3:8.2f} {flops / 1e9:11.1f} {tflops:8.1f} "
              f"{tflops * 1e12 / PEAK_FLOPS_BF16:6.1%}")


if __name__ == "__main__":
    main()
