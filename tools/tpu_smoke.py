"""TPU smoke test: every loss's value+grad is finite on real hardware.

Run on a TPU host: ``python tools/tpu_smoke.py``. Catches TPU-specific
numeric issues (reduced-precision matmuls, saturating casts, -inf handling)
that the CPU test suite can't see. Exercises both padding and batch-padding
dummy slates, plus the stochastic NeuralNDCG path through the fused Sinkhorn
kernel.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from allrank_tpu.losses import LOSSES


def main() -> int:
    rng = np.random.RandomState(0)
    B, L = 16, 240
    y_pred = jnp.asarray(rng.randn(B, L).astype(np.float32))
    y = rng.randint(0, 5, size=(B, L)).astype(np.float32)
    y[:, -40:] = -1.0
    y[-1, :] = -1.0  # one fully-padded (batch-dummy) slate
    y_true = jnp.asarray(y)
    slate_mask = jnp.asarray(np.arange(B) < B - 1)

    extra = {
        "ordinal": {"n": 4},
        "pointwise_rmse": {"no_of_levels": 4.0},
        "lambdaLoss": {"weighing_scheme": "ndcgLoss2PP_scheme", "mu": 10.0},
    }
    variants = [("", {})]
    failures = []
    for name, (fn, needs_rng) in sorted(LOSSES.items()):
        cases = [(name, dict(extra.get(name, {})))]
        if name == "neuralNDCG":
            cases.append((name + "[stochastic]",
                          {"stochastic": True, "n_samples": 4}))
        for label, kw in cases:
            if needs_rng:
                kw["rng"] = jax.random.PRNGKey(0)
            pred = y_pred
            if name == "ordinal":
                pred = jax.nn.sigmoid(
                    jnp.asarray(rng.randn(B, L, 4).astype(np.float32)))
            elif name == "bce":
                pred = jax.nn.sigmoid(y_pred)  # expects probabilities

            def loss_of(p, kw=kw, fn=fn):
                return fn(p, y_true, slate_mask=slate_mask, **kw)

            val, grad = jax.jit(jax.value_and_grad(loss_of))(pred)
            ok = bool(jnp.isfinite(val)) and bool(jnp.all(jnp.isfinite(grad)))
            print(f"{label:35s} loss={float(val):12.6f} "
                  f"grad_norm={float(jnp.linalg.norm(grad)):12.6f} "
                  f"{'OK' if ok else 'NON-FINITE'}")
            if not ok:
                failures.append(label)
    del variants
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all losses finite on", jax.devices()[0])
    return 0


if __name__ == "__main__":
    sys.exit(main())
