"""Headline benchmark: training throughput of the flagship ranker.

Measures end-to-end train-step throughput (slates/sec/chip) of the
context-aware Transformer scorer at WEB30K paper scale — FC[128] + 4-block
transformer (h=4, d_ff=512) + NDCGLoss2++ (the reference's headline config,
reference: reproducibility/configs/contextaware_web30k/ndcgloss2pp.json) —
batch 64, slate 240, 136 features, full forward+loss+backward+Adam per step.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...} with
supplementary keys ``flops_per_step`` (XLA cost analysis) and ``mfu`` (the
fraction of the chip's bf16 matmul peak the step sustains).
``vs_baseline`` compares against the reference implementation's measured
throughput on this machine's CPU (the only hardware both can run on here;
see tools/bench_torch_baseline.py + bench_baseline.json for provenance).

``python bench.py --sweep 64,128,256,512`` additionally prints a batch-size
sweep (slates/sec + MFU per B) to stderr, for the dispatch-bound vs
compute-bound regime table in BENCHMARKS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# bf16 matmul peak of the chip this bench runs on (TPU v5 lite / v5e:
# 197 TFLOP/s bf16 per chip). MFU is reported against this number.
PEAK_FLOPS_BF16 = 197e12


SCAN_STEPS = 8  # optimizer steps per dispatch (training.scan_steps)


def _build(batch, slate, feats, scan_steps=1):
    import jax

    from allrank_tpu.data.batching import SlateBatch
    from allrank_tpu.losses import get_loss
    from allrank_tpu.models.factory import init_params
    from allrank_tpu.training import make_optimizer
    from allrank_tpu.training.train_utils import make_train_step
    from __graft_entry__ import _example_batch, _flagship_mdef

    mdef = _flagship_mdef(feats)
    params = init_params(jax.random.PRNGKey(0), mdef)
    optimizer = make_optimizer("Adam", {"lr": 1e-3})
    opt_state = optimizer.init(params)
    loss_fn, needs_rng = get_loss("lambdaLoss")
    step = make_train_step(
        mdef, loss_fn, {"weighing_scheme": "ndcgLoss2PP_scheme", "mu": 10.0},
        needs_rng, optimizer, None, "bfloat16", scan_steps=scan_steps,
    )

    x, y, indices, _ = _example_batch(batch, slate, feats)
    y[:, -40:] = -1.0  # realistic padding tail
    indices[:, -40:] = -1
    b = SlateBatch(x, y, indices, np.ones(batch, dtype=bool))
    if scan_steps > 1:
        # K distinct stacked batches (rolled rows), as fit's _grouped feeds
        b = SlateBatch(*(np.stack([np.roll(leaf, k, axis=0)
                                   for k in range(scan_steps)])
                         for leaf in b))
    b = jax.device_put(b)
    return step, params, opt_state, b


def _step_flops(step, params, opt_state, rng, b):
    """XLA's FLOP estimate for the compiled train step, measured with the
    Pallas megakernels dispatched OFF — cost analysis cannot see inside a
    custom call, so the kernel-enabled program under-reports; the XLA-path
    program computes the identical math and gives the honest denominator
    for MFU. (None if the backend doesn't expose cost analysis.)"""
    import allrank_tpu.models.transformer as T

    saved = (T._mega_sublayer_runner, T._mega_ffn_runner,
             T._fused_attention_runner)
    try:
        T._mega_sublayer_runner = lambda *a, **k: None
        T._mega_ffn_runner = lambda *a, **k: None
        T._fused_attention_runner = lambda *a, **k: None
        cost = step.lower(params, opt_state, rng, b).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None
    finally:
        (T._mega_sublayer_runner, T._mega_ffn_runner,
         T._fused_attention_runner) = saved


def _measure(batch, slate=240, feats=136):
    """Times the step in the framework's production dispatch mode
    (``training.scan_steps`` = SCAN_STEPS: one device dispatch runs K
    optimizer steps as a lax.scan, exactly as ``fit`` does with grouped
    batches). Per-dispatch host/tunnel latency — ~0.8 ms on this tunneled
    runtime, irrelevant to on-chip throughput — amortizes over K steps
    instead of polluting every step."""
    import jax

    # flops per optimizer step from the single-step program (the scan
    # program's cost analysis counts its body once too, but the single-step
    # build keeps the number's provenance obvious)
    step1, params, opt_state, b1 = _build(batch, slate, feats, scan_steps=1)
    rng = jax.random.PRNGKey(1)
    flops = _step_flops(step1, params, opt_state, rng, b1)
    # the flop-counting lower() may have cached the kernels-off trace;
    # drop it so the timed run compiles with the kernels dispatched
    jax.clear_caches()

    step, params, opt_state, b = _build(batch, slate, feats,
                                        scan_steps=SCAN_STEPS)

    # warmup / compile (forced host readback: on tunneled TPU runtimes
    # block_until_ready returns before device completion — only a value
    # fetch truly synchronizes)
    for _ in range(3):
        params, opt_state, rng, loss, _n = step(params, opt_state, rng, b)
    float(loss[-1])

    def timed(n_dispatches):
        nonlocal params, opt_state, rng
        t0 = time.perf_counter()
        for _ in range(n_dispatches):
            params, opt_state, rng, loss, _n = step(params, opt_state, rng, b)
        float(loss[-1])  # force completion
        return time.perf_counter() - t0

    # two-point measurement cancels the constant dispatch+fetch overhead;
    # best-of-3 rejects tunnel-state noise (the shared tunneled chip shows
    # ±30% run-to-run drift that a single sample cannot average out)
    n1, n2 = 5, 25
    dt = float("inf")
    for _ in range(3):
        t1, t2 = timed(n1), timed(n2)
        dt = min(dt, max((t2 - t1) / (n2 - n1) / SCAN_STEPS, 1e-9))
    mfu = (flops / dt) / PEAK_FLOPS_BF16 if flops else None
    return batch / dt, dt, flops, mfu


def main() -> None:
    sweep = None
    if "--sweep" in sys.argv:
        arg = sys.argv[sys.argv.index("--sweep") + 1]
        sweep = [int(v) for v in arg.split(",")]

    slates_per_sec, dt, flops, mfu = _measure(64)

    if sweep:
        print(f"{'B':>5} {'ms/step':>9} {'slates/s':>10} {'TFLOP/s':>8} "
              f"{'MFU%':>6}", file=sys.stderr)
        for bsz in sweep:
            sps, sdt, sfl, smfu = _measure(bsz)
            tflops = (sfl / sdt) / 1e12 if sfl else float("nan")
            print(f"{bsz:>5} {sdt * 1e3:>9.2f} {sps:>10.0f} {tflops:>8.1f} "
                  f"{(smfu or 0) * 100:>6.2f}", file=sys.stderr)

    baseline = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f).get("slates_per_sec")

    print(json.dumps({
        "metric": "train_throughput_transformer_ndcgloss2pp_b64_l240",
        "value": round(slates_per_sec, 2),
        "unit": "slates/sec/chip",
        "vs_baseline": round(slates_per_sec / baseline, 2) if baseline else None,
        "flops_per_step": flops,
        "mfu": round(mfu, 4) if mfu else None,
        "ms_per_step": round(dt * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
