"""Unit tests for the optimizer registry, LR schedulers and early stopping."""

import jax.numpy as jnp
import numpy as np
import pytest

from allrank_tpu.training import EarlyStop, make_optimizer, make_scheduler
from allrank_tpu.training.optimizers import get_learning_rate, set_learning_rate
from allrank_tpu.training.schedulers import ReduceLROnPlateau, StepLR


def test_adam_matches_torch_reference_step():
    import torch

    w0 = np.array([1.0, -2.0, 3.0], dtype=np.float32)
    g = np.array([0.1, -0.5, 0.25], dtype=np.float32)

    t_w = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([t_w], lr=1e-2)
    for _ in range(3):
        t_w.grad = torch.tensor(g)
        opt.step()

    import optax

    optimizer = make_optimizer("Adam", {"lr": 1e-2})
    params = {"w": jnp.asarray(w0)}
    state = optimizer.init(params)
    for _ in range(3):
        updates, state = optimizer.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), t_w.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_sgd_momentum_matches_torch():
    import torch

    w0 = np.array([0.5, 1.5], dtype=np.float32)
    g = np.array([1.0, -1.0], dtype=np.float32)

    t_w = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([t_w], lr=0.1, momentum=0.9, weight_decay=0.01)
    for _ in range(4):
        t_w.grad = torch.tensor(g)
        opt.step()

    import optax

    optimizer = make_optimizer("SGD", {"lr": 0.1, "momentum": 0.9, "weight_decay": 0.01})
    params = {"w": jnp.asarray(w0)}
    state = optimizer.init(params)
    for _ in range(4):
        updates, state = optimizer.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), t_w.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_learning_rate_is_host_settable():
    optimizer = make_optimizer("Adam", {"lr": 1e-3})
    state = optimizer.init({"w": jnp.zeros(3)})
    assert get_learning_rate(state) == pytest.approx(1e-3)
    state = set_learning_rate(state, 5e-4)
    assert get_learning_rate(state) == pytest.approx(5e-4)


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError):
        make_optimizer("NoSuchOpt", {})


def test_step_lr_matches_torch_schedule():
    # torch semantics: epochs 0..step-1 at base, then *gamma per step_size
    sched = StepLR(base_lr=1.0, step_size=2, gamma=0.1)
    lrs = [sched.current_lr]
    for _ in range(5):
        lrs.append(sched.step())
    assert lrs == pytest.approx([1.0, 1.0, 0.1, 0.1, 0.01, 0.01])


def test_multistep_exponential_cosine():
    ms = make_scheduler("MultiStepLR", {"milestones": [2, 4], "gamma": 0.5}, 1.0)
    vals = [ms.current_lr] + [ms.step() for _ in range(4)]
    assert vals == pytest.approx([1.0, 1.0, 0.5, 0.5, 0.25])

    ex = make_scheduler("ExponentialLR", {"gamma": 0.9}, 2.0)
    assert ex.step() == pytest.approx(1.8)
    assert ex.step() == pytest.approx(1.62)

    cos = make_scheduler("CosineAnnealingLR", {"T_max": 10}, 1.0)
    assert cos.current_lr == pytest.approx(1.0)
    for _ in range(10):
        last = cos.step()
    assert last == pytest.approx(0.0, abs=1e-12)


def test_plateau_max_mode_reduces_after_patience():
    sched = ReduceLROnPlateau(
        base_lr=1.0, mode="max", factor=0.5, patience=1, threshold=1e-4
    )
    assert sched.step(0.5) == pytest.approx(1.0)  # new best
    assert sched.step(0.5) == pytest.approx(1.0)  # bad 1 (within patience)
    assert sched.step(0.5) == pytest.approx(0.5)  # bad 2 -> reduce
    assert sched.step(0.9) == pytest.approx(0.5)  # new best, no change


def test_early_stop_patience_semantics():
    es = EarlyStop(patience=2)
    es.step(0.5, 0)
    assert not es.stop_training(0)
    es.step(0.4, 1)
    es.step(0.4, 2)
    assert not es.stop_training(2)  # epoch - best == patience -> keep going
    es.step(0.4, 3)
    assert es.stop_training(3)  # strictly greater -> stop
    es.step(0.9, 4)
    assert not es.stop_training(4)


def test_early_stop_disabled_with_zero_patience():
    es = EarlyStop(patience=0)
    for e in range(5):
        es.step(0.1, e)
    assert not es.stop_training(4)
