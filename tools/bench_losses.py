"""Loss-zoo train-step throughput sweep on real TPU hardware.

Runs the flagship tower (FC[128] + 4-block transformer h=4 d_ff=512) with
every loss at the paper config (batch 64, slate 240, 136 features) and
honest device-synchronized timing. Writes BENCHMARKS.md at the repo root.

Usage: python tools/bench_losses.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from allrank_tpu.data.batching import SlateBatch
from allrank_tpu.losses import get_loss
from allrank_tpu.models.factory import init_params
from allrank_tpu.training import make_optimizer
from allrank_tpu.training.train_utils import make_train_step
from __graft_entry__ import _example_batch, _flagship_mdef
from tools.bench_util import time_steps

CASES = [
    ("pointwise_rmse", {"no_of_levels": 4.0}),
    ("bce", {}),
    ("listNet", {}),
    ("binary_listNet", {}),
    ("listMLE", {}),
    ("rankNet", {}),
    ("ordinal", {"n": 4}),
    ("lambdaLoss", {"weighing_scheme": "ndcgLoss2PP_scheme", "mu": 10.0}),
    ("lambdaLoss[lambdaRank]", {"weighing_scheme": "lambdaRank_scheme"}),
    ("approxNDCGLoss", {"alpha": 1.0}),
    ("neuralNDCG", {"temperature": 1.0}),
    ("neuralNDCG[stochastic,8]", {"temperature": 1.0, "stochastic": True,
                                  "n_samples": 8}),
    ("neuralNDCG[stochastic,32]", {"temperature": 1.0, "stochastic": True,
                                   "n_samples": 32}),
]


def bench_one(loss_entry, loss_args, batch=64, slate=240, feats=136,
              dtype="bfloat16"):
    name = loss_entry.split("[")[0]
    mdef = _flagship_mdef(feats)
    if name == "ordinal":
        from allrank_tpu.config import (FCConfig, ModelConfig,
                                        PositionalEncodingConfig,
                                        PostModelConfig, TransformerConfig)
        from allrank_tpu.models.factory import make_model

        mdef = make_model(ModelConfig(
            fc_model=FCConfig(sizes=[128], input_norm=True, activation="ReLU",
                              dropout=0.0),
            transformer=TransformerConfig(
                N=4, d_ff=512, h=4,
                positional_encoding=PositionalEncodingConfig("fixed", 256),
                dropout=0.0),
            post_model=PostModelConfig(d_output=4,
                                       output_activation="Sigmoid")), feats)
    params = init_params(jax.random.PRNGKey(0), mdef)
    opt = make_optimizer("Adam", {"lr": 1e-3})
    loss_fn, needs_rng = get_loss(name)
    if name == "bce":
        # bce expects probabilities: give the tower a sigmoid head
        from allrank_tpu.config import (FCConfig, ModelConfig,
                                        PositionalEncodingConfig,
                                        PostModelConfig, TransformerConfig)
        from allrank_tpu.models.factory import make_model

        mdef = make_model(ModelConfig(
            fc_model=FCConfig(sizes=[128], input_norm=True, activation="ReLU",
                              dropout=0.0),
            transformer=TransformerConfig(
                N=4, d_ff=512, h=4,
                positional_encoding=PositionalEncodingConfig("fixed", 256),
                dropout=0.0),
            post_model=PostModelConfig(d_output=1,
                                       output_activation="Sigmoid")), feats)
        params = init_params(jax.random.PRNGKey(0), mdef)
    step = make_train_step(mdef, loss_fn, loss_args, needs_rng, opt, None, dtype)
    x, y, indices, _ = _example_batch(batch, slate, feats)
    y[:, -40:] = -1.0
    indices[:, -40:] = -1
    b = jax.device_put(SlateBatch(x, y, indices, np.ones(batch, dtype=bool)))

    def once(st):
        p, o, r = st
        p, o, r, loss, _ = step(p, o, r, b)
        return (p, o, r), loss

    dt, _ = time_steps(once, (params, opt.init(params), jax.random.PRNGKey(1)))
    return dt


def main():
    device = str(jax.devices()[0])
    rows = []
    for entry, args in CASES:
        dt = bench_one(entry, args)
        rows.append((entry, dt * 1000, 64 / dt))
        print(f"{entry:30s} {dt*1000:7.2f} ms/step  {64/dt:10,.0f} slates/s",
              flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCHMARKS.md")
    head = ("# Loss-zoo train-step throughput (measured)\n\n"
            f"Device: {device}. Flagship tower FC[128] + 4-block "
            "transformer (h=4, d_ff=512, fixed positional encoding), "
            "batch 64, slate 240, 136 features, bfloat16 compute, full "
            "forward+loss+backward+Adam per step, device-synchronized "
            "two-point timing (tools/bench_util.py).\n\n"
            "| Loss | ms/step | slates/sec/chip |\n|---|---|---|\n")
    table = "".join(f"| {entry} | {ms:.2f} | {sps:,.0f} |\n"
                    for entry, ms, sps in rows)
    base = ("\nTorch-CPU reference-equivalent baseline on the same host: "
            "~47 slates/sec (tools/bench_torch_baseline.py).\n")
    # replace only the leading loss-table section; every later "## ..."
    # section of BENCHMARKS.md (attention, MFU sweep, ...) is preserved
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        cut = old.find("\n## ")
        if cut != -1:
            tail = old[cut:]
    with open(path, "w") as f:
        f.write(head + table + base + tail)
    print("wrote", path)


if __name__ == "__main__":
    main()
