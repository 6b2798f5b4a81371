"""Prototype probe: fused quantize->int8-matmul->dequant Pallas kernel vs
the XLA static-int8 chain vs bf16, at serving dense-layer shapes.

The round-5 static-int8 study (BENCHMARKS) bounds the XLA int8 win at
~1.15x over bf16 at d=1024 and names the residual: the per-activation
quantize pass (a separate VPU sweep materializing x_q) and the fp32
dequant epilogue. This kernel folds both into the matmul: the x tile is
quantized in VMEM right before the MXU dot and the int32 accumulator is
dequantized+biased in the epilogue — x_q and the int32 acc never touch
HBM.

Usage: python tools/exp_int8_matmul_kernel.py [--m 15360] [--shapes 1024x1024,1024x4096,4096x1024]
"""

from __future__ import annotations

import argparse
import functools
import sys

import numpy as np

sys.path.insert(0, ".")


@functools.lru_cache(maxsize=None)
def _make_kernel(M, K, N, TM, out_dtype_name):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_dtype = jnp.dtype(out_dtype_name)
    if M % TM:
        raise ValueError(
            f"--m ({M}) must be a multiple of the {TM}-row tile: the grid "
            f"runs M // TM blocks, so the last M % TM output rows would "
            "never be written (nondeterministic 'kernel mismatch')")

    def kern(x_ref, w_ref, os_ref, b_ref, inv_ref, o_ref):
        x = x_ref[...].astype(jnp.float32)
        xq = jnp.clip(jnp.round(x * inv_ref[0]), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[...] = (acc.astype(jnp.float32) * os_ref[...]
                      + b_ref[...]).astype(out_dtype)

    return pl.pallas_call(
        kern,
        grid=(M // TM,),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )


def fused_q8_dense(x, w_q, out_scale, b, x_inv_scale, tm=256):
    import jax.numpy as jnp

    M, K = x.shape
    N = w_q.shape[1]
    f = _make_kernel(M, K, N, tm, str(x.dtype))
    return f(x, w_q, out_scale.reshape(1, N).astype(jnp.float32),
             b.reshape(1, N).astype(jnp.float32),
             jnp.full((1,), x_inv_scale, dtype=jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=15360)  # B=64 x L=240
    ap.add_argument("--shapes", default="1024x1024,1024x4096,4096x1024")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0].device_kind}, M={args.m}, "
          f"x dtype {args.dtype}")
    print(f"{'KxN':>12} {'bf16-xla ms':>12} {'int8-xla ms':>12} "
          f"{'int8-pallas ms':>14} {'pallas vs bf16':>14}")

    rng = np.random.RandomState(0)
    for shape in args.shapes.split(","):
        K, N = (int(v) for v in shape.split("x"))
        x = jnp.asarray(rng.randn(args.m, K).astype(np.float32),
                        dtype=jnp.dtype(args.dtype))
        w = rng.randn(K, N).astype(np.float32) * 0.03
        s_w = np.abs(w).max(axis=0) / 127.0
        w_q = jnp.asarray(np.clip(np.round(w / s_w), -127, 127)
                          .astype(np.int8))
        w_bf = jnp.asarray(w, dtype=jnp.bfloat16)
        b = jnp.asarray(rng.randn(N).astype(np.float32))
        s_x = 4.0 / 127.0
        out_scale = jnp.asarray(s_x * s_w, dtype=jnp.float32)
        inv = 1.0 / s_x

        def bf16_xla(x):
            return (jax.lax.dot(x.astype(jnp.bfloat16), w_bf,
                                preferred_element_type=jnp.float32)
                    + b).astype(x.dtype)

        def int8_xla(x):
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                          -127, 127).astype(jnp.int8)
            acc = jax.lax.dot(xq, w_q, preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * out_scale + b).astype(x.dtype)

        def int8_pl(x):
            return fused_q8_dense(x, w_q, out_scale, b, inv)

        # correctness first
        ref = np.asarray(int8_xla(x), dtype=np.float32)
        got = np.asarray(int8_pl(x), dtype=np.float32)
        err = np.abs(ref - got).max() / max(1e-6, np.abs(ref).max())
        assert err < 2e-2, f"kernel mismatch {err}"

        # scan-chain timing (round-4 instrument): per-call timing through
        # the tunnel is dispatch-floor-bound; chain CH applications inside
        # ONE dispatch linked by an invisible scalar dependence
        import time

        CH = 16
        times = {}
        for name, fn in (("bf16", bf16_xla), ("i8xla", int8_xla),
                         ("i8pl", int8_pl)):
            @jax.jit
            def run(x, fn=fn):
                def body(carry, _):
                    out = fn(x + carry.astype(x.dtype))
                    return (jnp.mean(out.astype(jnp.float32))
                            * jnp.float32(1e-30)), ()

                final, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=CH)
                return final

            run(x).block_until_ready()
            best = float("inf")
            ND = 8  # async-pipelined dispatches, block once (tunnel rtt
            #         amortizes over ND*CH chained applications)
            for _ in range(4):
                t0 = time.perf_counter()
                out = None
                for _ in range(ND):
                    out = run(x)
                out.block_until_ready()
                best = min(best, (time.perf_counter() - t0) / (CH * ND))
            times[name] = best * 1e3
        print(f"{shape:>12} {times['bf16']:>12.3f} {times['i8xla']:>12.3f} "
              f"{times['i8pl']:>14.3f} "
              f"{times['bf16'] / times['i8pl']:>13.2f}x")


if __name__ == "__main__":
    main()
