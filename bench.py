"""Headline benchmark: training throughput of the flagship ranker.

Measures end-to-end train-step throughput (slates/sec/chip) of the
context-aware Transformer scorer at WEB30K paper scale — FC[128] + 4-block
transformer (h=4, d_ff=512) + NDCGLoss2++ (the reference's headline config,
reference: reproducibility/configs/contextaware_web30k/ndcgloss2pp.json) —
batch 64, slate 240, 136 features, full forward+loss+backward+Adam per step.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the reference implementation's measured
throughput on this machine's CPU (the only hardware both can run on here;
see tools/bench_torch_baseline.py + bench_baseline.json for provenance).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    from allrank_tpu.data.batching import SlateBatch
    from allrank_tpu.losses import get_loss
    from allrank_tpu.models.factory import init_params
    from allrank_tpu.training import make_optimizer
    from allrank_tpu.training.train_utils import make_train_step
    from __graft_entry__ import _example_batch, _flagship_mdef

    batch, slate, feats = 64, 240, 136
    mdef = _flagship_mdef(feats)
    params = init_params(jax.random.PRNGKey(0), mdef)
    optimizer = make_optimizer("Adam", {"lr": 1e-3})
    opt_state = optimizer.init(params)
    loss_fn, needs_rng = get_loss("lambdaLoss")
    step = make_train_step(
        mdef, loss_fn, {"weighing_scheme": "ndcgLoss2PP_scheme", "mu": 10.0},
        needs_rng, optimizer, None, "bfloat16",
    )

    x, y, indices, _ = _example_batch(batch, slate, feats)
    y[:, -40:] = -1.0  # realistic padding tail
    indices[:, -40:] = -1
    b = jax.device_put(SlateBatch(x, y, indices, np.ones(batch, dtype=bool)))

    rng = jax.random.PRNGKey(1)
    # warmup / compile (forced host readback: on tunneled TPU runtimes
    # block_until_ready returns before device completion — only a value
    # fetch truly synchronizes)
    for _ in range(3):
        params, opt_state, rng, loss, _n = step(params, opt_state, rng, b)
    float(loss)

    def timed(n_steps):
        nonlocal params, opt_state, rng
        t0 = time.perf_counter()
        for _ in range(n_steps):
            params, opt_state, rng, loss, _n = step(params, opt_state, rng, b)
        float(loss)  # force completion
        return time.perf_counter() - t0

    # two-point measurement cancels the constant dispatch+fetch overhead
    n1, n2 = 10, 50
    t1, t2 = timed(n1), timed(n2)
    dt = max((t2 - t1) / (n2 - n1), 1e-9)

    slates_per_sec = batch / dt

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
    }))


if __name__ == "__main__":
    main()
