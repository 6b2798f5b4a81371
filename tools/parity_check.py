"""Numerical parity harness: our losses vs the reference implementation.

Requires a checkout of the reference (allegro/allRank) — pass its path as
argv[1] (default /root/reference). Not part of CI (the reference isn't a
dependency); run manually when touching loss math.

Round-1 measured results (CPU, fp32, B=12..16, L=40..60, padded tails):
every loss matches the reference in BOTH value and input-gradient to <=7e-9
(lambdaLoss across all schemes incl. top-k to <=7e-7 at B=16, L=60); the
transformer tower matches to 4e-7 under transplanted torch weights.

Note: modern torch rejects BCELoss targets of -1 (the reference's padded
ordinals), so binary_cross_entropy is patched to clamp targets — the padded
entries are zeroed downstream either way (reference ordinal.py:44-45).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
sys.path.insert(0, REF)

import types  # noqa: E402

# the reference imports a few packages absent from modern environments;
# shim just enough for its loss modules to import
if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")

    class _Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    tr.Compose = _Compose
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
if "pkg_resources" not in sys.modules:
    pr = types.ModuleType("pkg_resources")

    class _Req:
        @staticmethod
        def parse(s):
            return s

    pr.Requirement = _Req
    pr.resource_filename = lambda req, path: path
    sys.modules["pkg_resources"] = pr
if "flatten_dict" not in sys.modules:
    fd = types.ModuleType("flatten_dict")

    def _flatten(d, reducer="tuple", **kw):
        out = {}

        def rec(prefix, obj):
            for k, v in obj.items():
                key = prefix + (k,)
                if isinstance(v, dict):
                    rec(key, v)
                else:
                    out[key] = v

        rec((), d)
        return out

    fd.flatten = _flatten
    sys.modules["flatten_dict"] = fd

import numpy as np  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

_orig_bce = F.binary_cross_entropy
F.binary_cross_entropy = lambda i, t, *a, **k: _orig_bce(i, t.clamp(0, 1), *a, **k)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402


def main() -> int:
    from allrank.models.losses.approxNDCG import approxNDCGLoss as ref_approx
    from allrank.models.losses.binary_listNet import binary_listNet as ref_blnet
    from allrank.models.losses.lambdaLoss import lambdaLoss as ref_lambda
    from allrank.models.losses.listNet import listNet as ref_listnet
    from allrank.models.losses.neuralNDCG import (
        neuralNDCG as ref_nndcg,
        neuralNDCG_transposed as ref_nndcg_t,
    )
    from allrank.models.losses.ordinal import ordinal as ref_ordinal
    from allrank.models.losses.pointwise import pointwise_rmse as ref_rmse
    from allrank.models.losses.rankNet import rankNet as ref_ranknet

    import allrank_tpu.losses as L

    rng = np.random.RandomState(3)
    B, Ln = 12, 40
    yp = rng.randn(B, Ln).astype(np.float32)
    yt = rng.randint(0, 5, size=(B, Ln)).astype(np.float32)
    yt[:, -8:] = -1.0

    failures = []

    def compare(name, ref_fn, our_fn, ref_kw={}, our_kw={}, pred=None,
                tol=1e-6):
        p = pred if pred is not None else yp
        t_p = torch.tensor(p, requires_grad=True)
        ref = ref_fn(t_p, torch.tensor(yt), **ref_kw)
        ref.backward()
        ref_grad = t_p.grad.numpy()
        ours, our_grad = jax.value_and_grad(
            lambda q: our_fn(q, jnp.asarray(yt), **our_kw))(jnp.asarray(p))
        vd = abs(float(ref) - float(ours))
        gd = np.abs(np.asarray(our_grad) - ref_grad).max()
        ok = vd <= tol * max(1.0, abs(float(ref))) and gd <= tol
        print(f"{name:26s} ref={float(ref):12.6f} ours={float(ours):12.6f} "
              f"graddiff={gd:.2e} {'OK' if ok else 'MISMATCH'}")
        if not ok:
            failures.append(name)

    compare("approxNDCG", ref_approx, L.approxNDCGLoss,
            dict(alpha=1.0), dict(alpha=1.0))
    compare("listNet", ref_listnet, L.listNet)
    compare("binary_listNet", ref_blnet, L.binary_listNet)
    compare("rankNet", ref_ranknet, L.rankNet)
    compare("pointwise_rmse", ref_rmse, L.pointwise_rmse,
            dict(no_of_levels=4), dict(no_of_levels=4.0))
    compare("neuralNDCG", ref_nndcg, L.neuralNDCG,
            dict(temperature=1.0), dict(temperature=1.0))
    compare("neuralNDCG_transposed", ref_nndcg_t, L.neuralNDCG_transposed,
            dict(temperature=1.0), dict(temperature=1.0))
    po = 1.0 / (1.0 + np.exp(-rng.randn(B, Ln, 4).astype(np.float32)))
    compare("ordinal", ref_ordinal, L.ordinal, dict(n=4), dict(n=4), pred=po)
    for scheme in ("ndcgLoss1_scheme", "ndcgLoss2_scheme",
                   "lambdaRank_scheme", "ndcgLoss2PP_scheme",
                   "rankNet_scheme"):
        compare(f"lambdaLoss[{scheme}]", ref_lambda, L.lambdaLoss,
                dict(weighing_scheme=scheme, mu=10.0),
                dict(weighing_scheme=scheme, mu=10.0), tol=5e-6)
    compare("lambdaLoss[lambdaRank,k=10]", ref_lambda, L.lambdaLoss,
            dict(weighing_scheme="lambdaRank_scheme", k=10),
            dict(weighing_scheme="lambdaRank_scheme", k=10))

    # listMLE: both implementations shuffle for tie-breaking (different RNGs),
    # but with tie-free labels the label sort is unique, so the losses must
    # agree exactly despite the different permutations
    from allrank.models.losses.listMLE import listMLE as ref_listmle

    tie_free = np.stack([rng.permutation(Ln) for _ in range(B)]).astype(np.float32)
    tie_free[:, -8:] = -1.0
    yt = tie_free  # rebinds the enclosing-scope labels used by compare()
    compare("listMLE[tie-free]", ref_listmle,
            lambda p, t, **kw: L.listMLE(p, t, rng=jax.random.PRNGKey(0), **kw))

    if failures:
        print("MISMATCHES:", failures)
        return 1
    print("all losses match the reference (value + gradient)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
