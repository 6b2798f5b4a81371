"""Serving-path benchmark: scorer latency + throughput on the real chip.

Measures the flagship tower (FC[128] + 4-block transformer h=4 d_ff=512,
reference: reproducibility/configs/contextaware_web30k/ndcgloss2pp.json) on
the serve path (`allrank_tpu.serving`):

  * marginal device time per scoring call (two-point chained fit — cancels
    the constant dispatch/tunnel overhead, see tools/bench_util.py), fp32
    vs bf16 compute, B in {1, 16, 64, 256};
  * per-call wall latency p50/p99 at B=1 (includes host dispatch + fetch —
    on a tunneled runtime this is dominated by the tunnel RTT; on a real
    TPU VM it is the serve-relevant number);
  * ranker (argsort) overhead on top of the scorer;
  * AOT compile time vs first-call jit compile time.

Usage: python tools/bench_serving.py [--slate 240] [--features 136]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slate", type=int, default=240)
    ap.add_argument("--features", type=int, default=136)
    ap.add_argument("--batches", type=str, default="1,16,64,256")
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _flagship_mdef
    from allrank_tpu.models.factory import init_params
    from allrank_tpu.serving import aot_compile, make_ranker, make_scorer
    from tools.bench_util import time_steps

    L, F = args.slate, args.features
    mdef = _flagship_mdef(F)
    params = init_params(jax.random.PRNGKey(0), mdef)
    print(f"device: {jax.devices()[0].device_kind}, slate={L}, F={F}")

    rng = np.random.RandomState(0)

    def batch(B):
        x = jax.device_put(rng.randn(B, L, F).astype(np.float32))
        lengths = jax.device_put(
            rng.randint(L // 2, L + 1, size=B).astype(np.int32))
        return x, lengths

    # --- marginal device time per call, fp32/bf16/int8, over batch sizes ---
    print("\nB      dtype     ms/call   slates/s")
    for B in [int(b) for b in args.batches.split(",")]:
        x, lengths = batch(B)
        scales = None
        for dtype in ("float32", "bfloat16", "int8", "int8_static"):
            if dtype == "int8":
                scorer = make_scorer(params, mdef, quantize="int8")
            elif dtype == "int8_static":
                if scales is None:
                    from allrank_tpu.quant import calibrate_activations

                    scales = calibrate_activations(
                        params, mdef,
                        [(np.asarray(x), np.asarray(lengths))])
                scorer = make_scorer(params, mdef, "bfloat16",
                                     quantize="int8_static",
                                     act_scales=scales)
            else:
                scorer = make_scorer(params, mdef, dtype)

            def step(state):
                s = scorer(x, lengths)
                return state, s[0, 0]

            sec, _ = time_steps(step, None)
            print(f"{B:<6} {dtype:<9} {sec * 1e3:7.3f}   {B / sec:10,.0f}")

    # --- wall latency distribution at B=1 (includes dispatch + fetch) ---
    x, lengths = batch(1)
    scorer = make_scorer(params, mdef, "bfloat16")
    np.asarray(scorer(x, lengths))  # compile + warm
    lats = []
    for _ in range(100):
        t0 = time.perf_counter()
        np.asarray(scorer(x, lengths))
        lats.append(time.perf_counter() - t0)
    lats = np.sort(np.array(lats)) * 1e3
    print(f"\nB=1 wall latency (bf16, host->device->host): "
          f"p50 {lats[49]:.2f} ms  p99 {lats[98]:.2f} ms "
          f"(tunneled runtimes: dominated by tunnel RTT)")

    # --- ranker overhead at B=64 ---
    x, lengths = batch(64)
    ranker = make_ranker(params, mdef, "bfloat16")

    def rstep(state):
        o = ranker(x, lengths)
        return state, o[0, 0]

    rsec, _ = time_steps(rstep, None)
    print(f"ranker (score+argsort) B=64: {rsec * 1e3:.3f} ms/call")

    # --- AOT compile vs first-call jit ---
    t0 = time.perf_counter()
    fresh = make_scorer(params, mdef, "bfloat16")
    compiled, info = aot_compile(fresh, 64, L, F)
    aot_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(compiled(x, lengths))
    first_call_s = time.perf_counter() - t0
    print(f"AOT compile {aot_s:.2f} s; first request after AOT "
          f"{first_call_s * 1e3:.1f} ms (no trace/compile on the hot path)")
    if info:
        print(f"executable analysis: {info}")


if __name__ == "__main__":
    main()
