"""Behavioral differential vs the reference: the FULL click-model zoo and
the metric zoo, run against the actual reference code on randomized slates.

The click models carry seeded golden tests; this harness goes wider — for
every model family (incl. the recursive/combinator ones) it runs
``click_on_slates`` through OUR host implementations and the REFERENCE's,
with identically-seeded global numpy RNG (both sides draw from np.random
in the same order, a deliberately preserved contract), and requires the
clicked outputs to match BITWISE across many random slates. The metric
sweep compares our jnp metrics against the reference's torch metrics on
random padded score/label batches.

Requires the reference checkout (argv[1], default /root/reference); not in
CI — run manually like tools/parity_check.py. Measured results live in
PARITY.md.

Usage: python tools/click_metric_parity.py [ref_path] [--cases 40]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reuse parity_check's import shims for the reference's stale dependencies
import tools.parity_check  # noqa: F401,E402

REF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
    else "/root/reference"
sys.path.insert(0, REF)

import numpy as np  # noqa: E402
import torch  # noqa: E402

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402


def model_pairs():
    """(name, ours, reference) triples covering the whole zoo."""
    import allrank.click_models.base as rb
    import allrank.click_models.cascade_models as rc
    import allrank.click_models.duplicate_aware as rd
    from allrank.click_models.click_utils import MaskedRemainMasked as RMask

    import allrank_tpu.click_models.base as ob
    import allrank_tpu.click_models.cascade_models as oc
    import allrank_tpu.click_models.duplicate_aware as od
    from allrank_tpu.click_models.click_utils import MaskedRemainMasked as OMask

    def pair(name, ours, ref):
        return (name, ours, ref)

    return [
        pair("RandomClickModel(2)", ob.RandomClickModel(2),
             rb.RandomClickModel(2)),
        pair("FixedClickModel([0,2])", ob.FixedClickModel([0, 2]),
             rb.FixedClickModel([0, 2])),
        pair("MaxClicksModel(OnlyRelevant, 2)",
             ob.MaxClicksModel(ob.OnlyRelevantClickModel(1), 2),
             rb.MaxClicksModel(rb.OnlyRelevantClickModel(1), 2)),
        pair("OnlyRelevantClickModel(2)", ob.OnlyRelevantClickModel(2),
             rb.OnlyRelevantClickModel(2)),
        pair("MultipleClickModel(fixed+relevant)",
             ob.MultipleClickModel(
                 [ob.FixedClickModel([0]), ob.OnlyRelevantClickModel(3)],
                 [0.35, 0.65]),
             rb.MultipleClickModel(
                 [rb.FixedClickModel([0]), rb.OnlyRelevantClickModel(3)],
                 [0.35, 0.65])),
        pair("ConditionedClickModel(fixed&relevant)",
             ob.ConditionedClickModel(
                 [ob.FixedClickModel([1]), ob.OnlyRelevantClickModel(2)],
                 np.all),
             rb.ConditionedClickModel(
                 [rb.FixedClickModel([1]), rb.OnlyRelevantClickModel(2)],
                 np.all)),
        pair("BaseCascadeModel(0.6, 2)", oc.BaseCascadeModel(0.6, 2),
             rc.BaseCascadeModel(0.6, 2)),
        pair("DiverseClicksModel(BaseCascade)",
             oc.DiverseClicksModel(oc.BaseCascadeModel(0.0, 2), 0.5),
             rc.DiverseClicksModel(rc.BaseCascadeModel(0.0, 2), 0.5)),
        pair("EverythingButDuplicates(0.99)",
             od.EverythingButDuplicatesClickModel(0.99),
             rd.EverythingButDuplicatesClickModel(0.99)),
        pair("MaskedRemainMasked(OnlyRelevant)",
             OMask(ob.OnlyRelevantClickModel(1)),
             RMask(rb.OnlyRelevantClickModel(1))),
    ]


def random_slates(rng, n_slates=6, L=9, F=4):
    X = np.round(rng.randn(n_slates, L, F), 3).astype(np.float32)
    y = rng.randint(0, 5, size=(n_slates, L)).astype(np.float32)
    for i in range(n_slates):
        # keep >=3 real docs: FixedClickModel's positions must exist in the
        # post-strip slate (the reference raises the same IndexError beyond)
        pad = rng.randint(0, L - 3)
        if pad:
            y[i, L - pad:] = -1.0
    # duplicates for the duplicate-aware model
    X[0, 1] = X[0, 0]
    return X, y


def run_clicks(cases: int):
    from allrank.click_models.click_utils import click_on_slates as ref_cos

    from allrank_tpu.click_models.click_utils import click_on_slates as our_cos

    failures = []
    for name, ours, ref in model_pairs():
        for case in range(cases):
            rng = np.random.RandomState(1000 + case)
            X, y = random_slates(rng)
            np.random.seed(77 + case)
            ours_out = our_cos((X, y), ours, include_empty=True)
            np.random.seed(77 + case)
            ref_out = ref_cos((torch.as_tensor(X), torch.as_tensor(y)),
                              ref, include_empty=True)
            ref_X = [np.asarray(t) for t in ref_out[0]]
            ref_y = [np.asarray(t) for t in ref_out[1]]
            for i, (a, b) in enumerate(zip(ours_out[0], ref_X)):
                if not np.array_equal(np.asarray(a), b):
                    failures.append(f"{name} case {case} slate {i}: X differs")
            for i, (a, b) in enumerate(zip(ours_out[1], ref_y)):
                if not np.array_equal(np.asarray(a, dtype=np.float32),
                                      b.astype(np.float32)):
                    failures.append(f"{name} case {case} slate {i}: clicks differ")
    return failures


def run_metrics(cases: int):
    import allrank.models.metrics as rm

    import allrank_tpu.metrics as om

    failures = []
    worst = 0.0
    for case in range(cases):
        rng = np.random.RandomState(2000 + case)
        B, L = rng.randint(2, 10), rng.randint(2, 40)
        y_pred = rng.randn(B, L).astype(np.float32)
        y_true = rng.randint(0, 5, size=(B, L)).astype(np.float32)
        for i in range(B):
            pad = rng.randint(0, L)
            if pad:
                y_true[i, L - pad:] = -1.0
        ats = sorted(set(int(a) for a in rng.randint(1, L + 1, size=3)))
        for mname in ("ndcg", "dcg", "mrr"):
            ref_v = getattr(rm, mname)(
                torch.as_tensor(y_pred), torch.as_tensor(y_true),
                ats=list(ats)).numpy()
            our_v = np.asarray(getattr(om, mname)(
                jnp.asarray(y_pred), jnp.asarray(y_true), ats=tuple(ats)))
            d = float(np.max(np.abs(ref_v - our_v)))
            worst = max(worst, d)
            if d > 1e-5:
                failures.append(f"{mname} case {case} ats={ats}: "
                                f"max delta {d:.2e}")
    return failures, worst


def main() -> int:
    cases = 40
    if "--cases" in sys.argv:
        cases = int(sys.argv[sys.argv.index("--cases") + 1])

    click_failures = run_clicks(cases)
    n_models = len(model_pairs())
    if click_failures:
        print(f"CLICK FAIL ({len(click_failures)}):")
        for f in click_failures[:10]:
            print("  " + f)
    else:
        print(f"clicks: {n_models} model families x {cases} randomized "
              f"slate batches — BITWISE equal to the reference")

    metric_failures, worst = run_metrics(cases)
    if metric_failures:
        print(f"METRIC FAIL ({len(metric_failures)}):")
        for f in metric_failures[:10]:
            print("  " + f)
    else:
        print(f"metrics: ndcg/dcg/mrr x {cases} randomized padded batches "
              f"— max |delta| vs the reference torch metrics {worst:.2e}")

    ok = not click_failures and not metric_failures
    print("CLICK+METRIC PARITY " + ("OK" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
