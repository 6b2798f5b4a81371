"""CI subset of the property-based differential fuzz (tools/fuzz_losses.py).

Every loss (all 7 lambda schemes x sum/mean/k, both neuralNDCG variants) and
every metric is checked against an independent fp64 numpy reference across
seeded random cases — small L, every padding pattern, ties, slate masks —
with gradients verified by central finite differences OF THE REFERENCE.
The full sweep (L up to 385, more seeds, kernel-dispatch differentials on
TPU) runs via ``python tools/fuzz_losses.py``; results in BENCHMARKS.md.
"""

import numpy as np
import pytest

from tools.fuzz_losses import (
    LOSS_SPECS,
    gen_case,
    run_kernel_differential,
    run_sweep,
    _jax_grad,
    _jax_loss,
)


def test_fuzz_sweep_small_shapes():
    report = run_sweep([0], [1, 2, 7, 12], include_extreme=False)
    assert report["checked"] > 900
    assert report["failures"] == [], report["failures"][:5]


def test_extreme_scores_stay_finite():
    """+-1e8-scale scores (unnormalized feature blowups) must not NaN any
    loss value or gradient. Regression for the Sinkhorn zero-column freeze:
    one-hot softmax rows leave empty columns whose eps-divided scalings
    compounded to inf*0=NaN before the fix (ops/soft_sort.py,
    ops/sinkhorn_pallas.py)."""
    import math

    rng = np.random.RandomState(10_000)
    for name, kwargs, _ref, needs in LOSS_SPECS:
        yp, yt, sm = gen_case(rng, 5, 12, pad_pattern="random", extreme=True,
                              unique_labels=needs.get("unique_labels", False))
        v = _jax_loss(name, kwargs)(yp, yt, sm)
        g = _jax_grad(name, kwargs)(yp, yt, sm)
        assert math.isfinite(v), (name, kwargs, v)
        assert np.isfinite(g).all(), (name, kwargs)


def test_sinkhorn_zero_column_freeze_matches_mat_form():
    """A p_hat with an exactly-zero column must come out of sinkhorn finite
    with that column still zero and every other column/row scaled."""
    import jax
    import jax.numpy as jnp

    from allrank_tpu.ops.soft_sort import sinkhorn_scaling

    m = np.array([[[0.7, 0.0, 0.3],
                   [0.9, 0.0, 0.1],
                   [0.2, 0.0, 0.8]]], dtype=np.float32)
    out = np.asarray(sinkhorn_scaling(jnp.asarray(m),
                                      jnp.zeros((1, 3), dtype=bool)))
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[0, :, 1], 0.0)
    # a dead column makes true double-stochasticity impossible; rows (the
    # last normalization of each iteration) still come out unit-sum
    np.testing.assert_allclose(out[0].sum(axis=1), 1.0, atol=1e-4)

    # and the gradient through it stays finite
    def f(x):
        return jnp.sum(sinkhorn_scaling(x, jnp.zeros((1, 3), dtype=bool)) ** 2)

    g = np.asarray(jax.grad(f)(jnp.asarray(m)))
    assert np.isfinite(g).all()


def test_kernel_differential_runs():
    """On CPU both dispatch arms take the XLA path (the TPU run exercises
    the real kernels — tools/fuzz_losses.py --kernels); this pins the
    harness itself and the monkeypatch seams."""
    report = run_kernel_differential([0], [12])
    assert report["checked"] > 0
    assert report["failures"] == [], report["failures"][:5]


@pytest.mark.parametrize("pattern", ["one_real", "with_all_padded"])
def test_degenerate_padding_cases_agree(pattern):
    """The masked static-shape reformulations' classic breaking points:
    one real doc per slate, and fully-padded slates in the batch."""
    report = run_sweep([3], [5], pad_patterns=[pattern],
                       include_extreme=False, grad_coords=2)
    assert report["failures"] == [], report["failures"][:5]
