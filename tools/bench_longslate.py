"""End-to-end long-slate train step: flagship tower + NDCGLoss2++ at
L=1024/2048 — the shapes where the reference's only option is subsampling
to 240 (allrank/data/dataset_loading.py:61-79). One jitted step = forward
(K-tiled online-softmax attention kernel) + loss (pair-tiled lambda kernel)
+ backward + Adam, device-synchronized timing.

Usage: python tools/bench_longslate.py
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
from __graft_entry__ import _flagship_mdef
from tools.bench_util import time_steps


def bench(batch, slate, feats=136):
    mdef = _flagship_mdef(feats)
    params = init_params(jax.random.PRNGKey(0), mdef)
    opt = make_optimizer("Adam", {"lr": 1e-3})
    loss_fn, needs_rng = get_loss("lambdaLoss")
    step = make_train_step(
        mdef, loss_fn, {"weighing_scheme": "ndcgLoss2PP_scheme", "mu": 10.0},
        needs_rng, opt, None, "bfloat16",
    )
    rng = np.random.RandomState(0)
    x = rng.randn(batch, slate, feats).astype(np.float32)
    y = rng.randint(0, 5, size=(batch, slate)).astype(np.float32)
    y[:, -slate // 4:] = -1.0  # ragged tails
    idx = np.tile(np.arange(slate, dtype=np.int32), (batch, 1))
    idx[:, -slate // 4:] = -1
    b = jax.device_put(SlateBatch(x, y, idx, np.ones(batch, bool)))
    opt_state = opt.init(params)

    def once(state):
        params, opt_state, rng = state
        params, opt_state, rng, loss, _ = step(params, opt_state, rng, b)
        return (params, opt_state, rng), loss

    sec, _ = time_steps(once, (params, opt_state, jax.random.PRNGKey(1)),
                        n1=5, n2=20)
    return sec


def main():
    print("device:", jax.devices()[0])
    print(f"{'B':>4} {'L':>6} {'ms/step':>9} {'slates/s':>10}")
    for b, l in [(64, 240), (64, 1024), (32, 2048), (16, 4096)]:
        sec = bench(b, l)
        print(f"{b:>4} {l:>6} {sec*1e3:9.2f} {b/sec:10,.0f}")


if __name__ == "__main__":
    main()
