"""Per-name trajectory parity of the full optimizer/scheduler registries vs
torch (reference dispatches any torch.optim / torch.optim.lr_scheduler name,
allrank/main.py:82-87).

Each optimizer is driven for 10 steps with identical parameters and a varied
deterministic gradient stream on both sides (torch.optim in fp64 vs our optax
chain in fp64 via the x64 context); trajectories must agree to <=1e-6 at
every step. Each non-plateau scheduler's LR sequence is compared against the
actual ``torch.optim.lr_scheduler`` class for 30 epochs.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

STEPS = 10
W0 = np.array([1.0, -2.0, 0.5, 3.0], dtype=np.float64)


def _grad(t: int) -> np.ndarray:
    return np.array(
        [0.1 * (t + 1), -0.2, 0.3 * math.sin(t + 1.0), 0.05 * (-1.0) ** t],
        dtype=np.float64,
    )


def _torch_trajectory(name: str, kwargs) -> np.ndarray:
    p = torch.nn.Parameter(torch.tensor(W0))
    opt = getattr(torch.optim, name)([p], **kwargs)
    traj = []
    for t in range(STEPS):
        opt.zero_grad()
        p.grad = torch.tensor(_grad(t))
        opt.step()
        traj.append(p.detach().numpy().copy())
    return np.array(traj)


def _ours_trajectory(name: str, args) -> np.ndarray:
    import jax
    import jax.numpy as jnp
    import optax

    from allrank_tpu.training import make_optimizer

    with jax.enable_x64():
        tx = make_optimizer(name, dict(args))
        params = {"w": jnp.asarray(W0)}
        state = tx.init(params)
        traj = []
        for t in range(STEPS):
            updates, state = tx.update({"w": jnp.asarray(_grad(t))}, state, params)
            params = optax.apply_updates(params, updates)
            traj.append(np.asarray(params["w"], dtype=np.float64))
    return np.array(traj)


OPTIMIZER_CASES = [
    ("Adam", {"lr": 1e-2}),
    ("Adam", {"lr": 1e-2, "betas": [0.8, 0.95], "eps": 1e-7, "weight_decay": 1e-2}),
    ("AdamW", {"lr": 1e-2, "weight_decay": 0.05}),
    ("SGD", {"lr": 0.1}),
    ("SGD", {"lr": 0.1, "momentum": 0.9, "weight_decay": 1e-2, "nesterov": True}),
    ("RMSprop", {"lr": 1e-2, "alpha": 0.95, "momentum": 0.5}),
    ("RMSprop", {"lr": 1e-2, "alpha": 0.95, "centered": True}),
    ("Adagrad", {"lr": 1e-2, "weight_decay": 1e-3}),
    ("Adadelta", {"lr": 1.0, "rho": 0.8}),
    ("NAdam", {"lr": 2e-3}),
    ("NAdam", {"lr": 2e-3, "betas": [0.85, 0.99], "weight_decay": 1e-2,
               "momentum_decay": 6e-3}),
    ("RAdam", {"lr": 1e-3}),
    ("RAdam", {"lr": 1e-3, "betas": [0.85, 0.99], "weight_decay": 1e-2}),
]


@pytest.mark.parametrize("name,args", OPTIMIZER_CASES,
                         ids=[f"{n}-{i}" for i, (n, _) in enumerate(OPTIMIZER_CASES)])
def test_optimizer_trajectory_matches_torch(name, args):
    ours = _ours_trajectory(name, args)
    theirs = _torch_trajectory(name, args)
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-6)


def _torch_lr_sequence(name: str, kwargs, epochs: int = 30):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = getattr(torch.optim.lr_scheduler, name)(opt, **kwargs)
    lrs = [sched.get_last_lr()[0]]
    for _ in range(epochs):
        opt.step()
        sched.step()
        lrs.append(sched.get_last_lr()[0])
    return np.array(lrs)


def _ours_lr_sequence(name: str, args, epochs: int = 30):
    from allrank_tpu.training import make_scheduler

    sched = make_scheduler(name, dict(args), base_lr=1.0)
    lrs = [sched.current_lr]
    for _ in range(epochs):
        lrs.append(sched.step())
    return np.array(lrs)


SCHEDULER_CASES = [
    ("StepLR", {"step_size": 4, "gamma": 0.5}, {}),
    ("MultiStepLR", {"milestones": [3, 7, 20], "gamma": 0.3}, {}),
    ("ExponentialLR", {"gamma": 0.93}, {}),
    ("ConstantLR", {"factor": 0.25, "total_iters": 6}, {}),
    ("CosineAnnealingLR", {"T_max": 12, "eta_min": 0.05}, {}),
    ("CosineAnnealingWarmRestarts", {"T_0": 5}, {}),
    ("CosineAnnealingWarmRestarts", {"T_0": 3, "T_mult": 2, "eta_min": 0.01}, {}),
    ("LinearLR", {"start_factor": 0.1, "end_factor": 1.0, "total_iters": 8}, {}),
    ("LambdaLR", {"lr_lambda": "0.95 ** epoch"},
     {"lr_lambda": lambda epoch: 0.95**epoch}),
]


@pytest.mark.parametrize(
    "name,args,torch_overrides", SCHEDULER_CASES,
    ids=[f"{n}-{i}" for i, (n, _, _) in enumerate(SCHEDULER_CASES)])
def test_scheduler_sequence_matches_torch(name, args, torch_overrides):
    ours = _ours_lr_sequence(name, args)
    theirs = _torch_lr_sequence(name, {**args, **torch_overrides})
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-9)


def test_lambda_lr_rejects_non_expression():
    from allrank_tpu.training import make_scheduler

    with pytest.raises(ValueError):
        make_scheduler("LambdaLR", {"lr_lambda": 3.5}, base_lr=1.0)


def test_lambda_lr_expression_cannot_reach_builtins():
    from allrank_tpu.training import make_scheduler

    # the expression is evaluated with empty __builtins__ at construction
    # (epoch 0) — __import__ must not resolve
    with pytest.raises(NameError):
        make_scheduler(
            "LambdaLR", {"lr_lambda": "__import__('os').getpid()"}, base_lr=1.0
        )


def test_warm_restarts_exact_at_deep_restart_boundaries():
    """Regression: the closed-form epoch->lr used int(math.log(...)), which
    truncates at exact restart boundaries where the float log lands just
    below an integer (T_0=1, T_mult=3, epoch 121 -> log=4.999...), turning
    the restart peak base_lr into eta_min. The integer-arithmetic repair
    must match torch's per-epoch stepping across hundreds of epochs."""
    import torch

    from allrank_tpu.training.schedulers import CosineAnnealingWarmRestarts

    for T_0, T_mult, span in ((1, 3, 400), (2, 3, 730), (3, 5, 500)):
        ours = CosineAnnealingWarmRestarts(base_lr=1.0, T_0=T_0,
                                           T_mult=T_mult)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1.0)
        ref = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
            opt, T_0=T_0, T_mult=T_mult)
        for epoch in range(span):
            assert abs(ours._lr_at(epoch) - ref.get_last_lr()[0]) < 1e-12, \
                (T_0, T_mult, epoch)
            opt.step()
            ref.step()
