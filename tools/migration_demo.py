"""End-to-end migration demo: train with the ACTUAL reference code, switch
to allrank_tpu, keep everything.

What it does, in order:

  1. trains an LTR model with the reference's own torch stack
     (allrank.models.model.make_model + allrank.training.loss_batch +
     torch.optim.Adam, lambdaLoss[ndcgLoss2++]) on seeded synthetic slates;
  2. saves the reference-format checkpoint (``model.pkl`` — a pickled torch
     state_dict, exactly what the reference's fit writes);
  3. imports it WITHOUT retraining through interop
     (load_torch_state_dict -> torch_state_dict_to_params);
  4. proves the imported model is the same function: held-out scores match
     the torch model's to float32 round-off;
  5. serves it through this framework: make_scorer (+ int8 variant) and
     the offline metric evaluation — i.e. the complete post-migration
     surface a reference user lands on.

This is MIGRATION.md's recipe executed against the real reference code
end-to-end. Requires the reference checkout (argv[1], default
/root/reference); run manually like tools/parity_check.py.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.parity_check  # noqa: F401,E402  (reference import shims)

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
sys.path.insert(0, REF)

import numpy as np  # noqa: E402
import torch  # noqa: E402

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

B, L, F_FEAT, STEPS = 16, 20, 16, 30


def main() -> int:
    from allrank.config import PositionalEncoding as RefPE
    from allrank.config import TransformerConfig as RefTC
    from allrank.models.losses.lambdaLoss import lambdaLoss as ref_lambda
    from allrank.models.model import make_model as ref_make_model
    from allrank.training.train_utils import loss_batch as ref_loss_batch

    # ---- 1. train with the reference's own stack -------------------------
    torch.manual_seed(3)
    model = ref_make_model(
        fc_model={"sizes": [24], "input_norm": True, "activation": "ReLU",
                  "dropout": 0.0},
        transformer=RefTC(N=1, d_ff=32, h=2, dropout=0.0,
                          positional_encoding=RefPE(strategy="fixed",
                                                    max_indices=L + 5)),
        post_model={"d_output": 1},
        n_features=F_FEAT,
    )
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    rng = np.random.RandomState(0)
    model.train()
    first = last = None
    for _ in range(STEPS):
        x = rng.randn(B, L, F_FEAT).astype(np.float32)
        y = rng.randint(0, 5, size=(B, L)).astype(np.float32)
        idx = np.tile(np.arange(L, dtype=np.int64), (B, 1))
        loss, _ = ref_loss_batch(
            model, lambda yp, yt: ref_lambda(
                yp, yt, weighing_scheme="ndcgLoss2PP_scheme", mu=10.0),
            torch.as_tensor(x), torch.as_tensor(y), torch.as_tensor(idx),
            None, opt)
        first = loss if first is None else first
        last = loss
    print(f"1. reference training ran {STEPS} steps "
          f"(loss {first:.2f} -> {last:.2f})")

    # ---- 2. the reference-format checkpoint ------------------------------
    tmp = tempfile.mkdtemp()
    pkl = os.path.join(tmp, "model.pkl")
    torch.save(model.state_dict(), pkl)
    print(f"2. saved reference checkpoint {pkl} "
          f"({os.path.getsize(pkl)} bytes)")

    # ---- 3. import without retraining ------------------------------------
    from allrank_tpu.config import (
        FCConfig,
        ModelConfig,
        PositionalEncodingConfig,
        PostModelConfig,
        TransformerConfig,
    )
    from allrank_tpu.interop import load_torch_state_dict, torch_state_dict_to_params
    from allrank_tpu.models.factory import make_model

    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[24], input_norm=True,
                              activation="ReLU", dropout=0.0),
            transformer=TransformerConfig(
                N=1, d_ff=32, h=2, dropout=0.0,
                positional_encoding=PositionalEncodingConfig(
                    strategy="fixed", max_indices=L + 5)),
            post_model=PostModelConfig(d_output=1),
        ), F_FEAT,
    )
    params = torch_state_dict_to_params(load_torch_state_dict(pkl), mdef)
    print("3. imported into allrank_tpu params (no retraining)")

    # ---- 4. same function? -----------------------------------------------
    xh = np.random.RandomState(99).randn(8, L, F_FEAT).astype(np.float32)
    mask = np.zeros((8, L), dtype=bool)
    idx = np.tile(np.arange(L, dtype=np.int64), (8, 1))
    model.eval()
    with torch.no_grad():
        ref_scores = model.score(torch.as_tensor(xh), torch.as_tensor(mask),
                                 torch.as_tensor(idx)).numpy()
    from allrank_tpu.models.factory import score as our_score

    ours = np.asarray(our_score(params, mdef, xh, mask,
                                idx.astype(np.int32), train=False))
    srel = float(np.max(np.abs(ours - ref_scores))
                 / max(1e-12, np.max(np.abs(ref_scores))))
    print(f"4. held-out scores match the torch model to {srel:.2e} rel")
    assert srel < 1e-5, srel

    # ---- 5. the post-migration surface -----------------------------------
    from allrank_tpu.metrics import ndcg
    from allrank_tpu.serving import make_scorer

    lengths = np.full(8, L, dtype=np.int32)
    s32 = np.asarray(make_scorer(params, mdef)(xh, lengths))
    s8 = np.asarray(make_scorer(params, mdef, quantize="int8")(xh, lengths))
    y_eval = np.random.RandomState(5).randint(
        0, 5, size=(8, L)).astype(np.float32)
    import jax.numpy as jnp

    n32 = float(np.mean(np.asarray(ndcg(jnp.asarray(s32),
                                        jnp.asarray(y_eval), ats=(5,)))))
    n8 = float(np.mean(np.asarray(ndcg(jnp.asarray(s8),
                                       jnp.asarray(y_eval), ats=(5,)))))
    print(f"5. served through allrank_tpu: fp32 ndcg@5 {n32:.4f}, "
          f"int8 ndcg@5 {n8:.4f} (delta {abs(n32 - n8):.1e})")
    assert abs(n32 - n8) < 0.02

    print("MIGRATION DEMO OK — reference-trained model runs unchanged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
