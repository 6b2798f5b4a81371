"""Full training-LOOP differential vs the reference: N optimizer steps of
the whole stack (FC tower + transformer + lambdaLoss[ndcgLoss2++] + Adam)
must track the reference's torch loop step-for-step.

Existing parity evidence is per-component (losses <=7e-9, tower forward
4e-7, each optimizer's update trajectory <=1e-6); this harness closes the
integration gap: identical Xavier weights are transplanted through
interop.params_to_torch_state_dict into the REAL reference model
(allrank.models.model.make_model), both sides step on identical batches
with their own Adam, and per-step losses + final parameters are compared.
Any semantic drift in forward/mask/loss-weighting/optimizer WIRING (not
just the parts) shows up as trajectory divergence.

Runs on CPU (fp32 both sides). Requires the reference checkout (argv[1],
default /root/reference). Not part of CI — run manually like
tools/parity_check.py; measured results are recorded in PARITY.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"

# reuse parity_check's import shims for the reference's stale dependencies
import tools.parity_check  # noqa: F401,E402

sys.path.insert(0, REF)

import numpy as np  # noqa: E402
import torch  # noqa: E402

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from allrank.config import PositionalEncoding as RefPE  # noqa: E402
from allrank.config import TransformerConfig as RefTC  # noqa: E402
from allrank.models.model import make_model as ref_make_model  # noqa: E402
from allrank.models.losses.lambdaLoss import lambdaLoss as ref_lambda  # noqa: E402
from allrank.training.train_utils import loss_batch as ref_loss_batch  # noqa: E402

from allrank_tpu.config import (  # noqa: E402
    FCConfig,
    ModelConfig,
    PositionalEncodingConfig,
    PostModelConfig,
    TransformerConfig,
)
from allrank_tpu.data.batching import SlateBatch  # noqa: E402
from allrank_tpu.interop import params_to_torch_state_dict  # noqa: E402
from allrank_tpu.losses import get_loss  # noqa: E402
from allrank_tpu.models.factory import init_params, make_model  # noqa: E402
from allrank_tpu.training import make_optimizer  # noqa: E402
from allrank_tpu.training.train_utils import make_train_step  # noqa: E402

B, L, F_FEAT, STEPS, LR = 16, 30, 24, 10, 1e-3
LOSS_ARGS = {"weighing_scheme": "ndcgLoss2PP_scheme", "mu": 10.0}


def build_models():
    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[32], input_norm=True,
                              activation="ReLU", dropout=0.0),
            transformer=TransformerConfig(
                N=2, d_ff=64, h=2, dropout=0.0,
                positional_encoding=PositionalEncodingConfig(
                    strategy="fixed", max_indices=L + 5),
            ),
            post_model=PostModelConfig(d_output=1),
        ), F_FEAT,
    )
    params = init_params(jax.random.PRNGKey(7), mdef)

    ref_model = ref_make_model(
        fc_model={"sizes": [32], "input_norm": True, "activation": "ReLU",
                  "dropout": 0.0},
        transformer=RefTC(
            N=2, d_ff=64, h=2, dropout=0.0,
            positional_encoding=RefPE(strategy="fixed", max_indices=L + 5),
        ),
        post_model={"d_output": 1},
        n_features=F_FEAT,
    )
    sd = {k: torch.as_tensor(v)
          for k, v in params_to_torch_state_dict(params, mdef).items()}
    missing, unexpected = ref_model.load_state_dict(sd, strict=False)
    # buffers the exporter doesn't emit (the reference's fixed PE table) stay
    # at their constructed values — they are deterministic and identical
    assert not unexpected, unexpected
    assert all("positional_encoding" in m for m in missing), missing
    return mdef, params, ref_model


def batches(seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(STEPS):
        x = rng.randn(B, L, F_FEAT).astype(np.float32)
        y = rng.randint(0, 5, size=(B, L)).astype(np.float32)
        n_pad = rng.randint(0, L // 2, size=B)
        indices = np.tile(np.arange(L, dtype=np.int64), (B, 1))
        for b in range(B):
            if n_pad[b]:
                y[b, L - n_pad[b]:] = -1.0
                indices[b, L - n_pad[b]:] = -1
        out.append((x, y, indices))
    return out


def main() -> int:
    mdef, params, ref_model = build_models()
    data = batches()

    # ---- reference loop: the REAL loss_batch + torch.optim.Adam ----------
    opt = torch.optim.Adam(ref_model.parameters(), lr=LR)
    ref_model.train()
    ref_losses = []
    loss_func = lambda yp, yt: ref_lambda(yp, yt, **LOSS_ARGS)  # noqa: E731
    for x, y, idx in data:
        loss, _ = ref_loss_batch(
            ref_model, loss_func, torch.as_tensor(x), torch.as_tensor(y),
            torch.as_tensor(idx), None, opt,
        )
        ref_losses.append(loss)

    # ---- our loop: the REAL make_train_step --------------------------------
    loss_fn, needs_rng = get_loss("lambdaLoss")
    optimizer = make_optimizer("Adam", {"lr": LR})
    opt_state = optimizer.init(params)
    step = make_train_step(mdef, loss_fn, LOSS_ARGS, needs_rng, optimizer,
                           None, "float32")
    rng = jax.random.PRNGKey(0)
    our_losses = []
    for x, y, idx in data:
        batch = SlateBatch(x, y, idx.astype(np.int32),
                           np.ones(B, dtype=bool))
        params, opt_state, rng, loss, _n = step(params, opt_state, rng, batch)
        our_losses.append(float(np.asarray(loss).reshape(-1)[-1]))

    # ---- compare -----------------------------------------------------------
    print(f"{'step':>4} {'ref loss':>12} {'ours':>12} {'rel delta':>10}")
    worst = 0.0
    for i, (a, b) in enumerate(zip(ref_losses, our_losses)):
        rel = abs(a - b) / max(abs(a), 1e-12)
        worst = max(worst, rel)
        print(f"{i:>4} {a:>12.7f} {b:>12.7f} {rel:>10.2e}")

    final_sd = params_to_torch_state_dict(params, mdef)
    ref_sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    print(f"\nworst per-step loss rel delta over {STEPS} steps: {worst:.2e}")
    print("final weight deltas per tensor (Adam amplifies fp32 noise on "
          "zero-gradient coordinates to O(lr)/step — look at the bulk, and "
          "at function space below, not the max alone):")
    for k, v in sorted(final_sd.items()):
        d = np.abs(ref_sd[k] - np.asarray(v))
        print(f"  {k:<48} max {d.max():.2e}  p50 {np.median(d):.2e}")

    # the decisive check is FUNCTION space: both trained models must score a
    # held-out batch identically
    xh = np.random.RandomState(999).randn(B, L, F_FEAT).astype(np.float32)
    idx = np.tile(np.arange(L, dtype=np.int64), (B, 1))
    mask = np.zeros((B, L), dtype=bool)
    ref_model.eval()
    with torch.no_grad():
        ref_scores = ref_model.score(
            torch.as_tensor(xh), torch.as_tensor(mask),
            torch.as_tensor(idx)).numpy()
    from allrank_tpu.models.factory import score as our_score

    ours_scores = np.asarray(our_score(
        params, mdef, xh, mask, idx.astype(np.int32), train=False))
    srel = np.max(np.abs(ref_scores - ours_scores)) / max(
        1e-12, float(np.max(np.abs(ref_scores))))
    # ranking-equivalent comparison: the biggest weight outliers are the
    # provably-zero-gradient coordinates — the K-projection bias (softmax
    # scores are invariant to it: q·(k+b) adds a per-query constant) and
    # the output bias (listwise losses are invariant to a constant score
    # shift) — so both frameworks integrate pure fp32 noise there under
    # Adam (update = noise/sqrt(noise²) ≈ ±lr/step). Removing the per-model
    # mean shift compares what ranking actually sees.
    c = (ours_scores - ours_scores.mean()) - (ref_scores - ref_scores.mean())
    crel = np.max(np.abs(c)) / max(1e-12, float(np.ptp(ref_scores)))
    print(f"held-out scores of the two TRAINED models: max rel delta "
          f"{srel:.2e}; shift-invariant (what ranking sees): {crel:.2e}")
    ok = worst < 5e-4 and crel < 1e-3
    print("TRAIN-LOOP PARITY " + ("OK" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
