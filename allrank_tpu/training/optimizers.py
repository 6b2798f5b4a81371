"""Optimizer registry: config names -> optax transforms.

The reference dispatches optimizer names straight into ``torch.optim``
(reference: allrank/main.py:82), so configs say "Adam", "SGD", ... with torch
argument names. This module maps those names and args onto optax chains with
matching update rules, wrapped in ``optax.inject_hyperparams`` so the host
epoch loop can retune the learning rate between steps (LR schedules, plateau
scheduling) without recompiling the train step.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import optax


def _maybe_decayed(weight_decay: float) -> optax.GradientTransformation:
    # torch-style L2: wd * param added to the gradient *before* the
    # accumulator updates.
    if weight_decay:
        return optax.add_decayed_weights(weight_decay)
    return optax.identity()


def _adam(learning_rate=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0,
          amsgrad=False):
    del amsgrad  # optax.scale_by_adam has no amsgrad; unsupported -> ignored
    return optax.chain(
        _maybe_decayed(weight_decay),
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        optax.scale(-learning_rate),
    )


def _adamw(learning_rate=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-2):
    return optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale(-learning_rate),
    )


def _sgd(learning_rate=1e-2, momentum=0.0, weight_decay=0.0, nesterov=False):
    return optax.chain(
        _maybe_decayed(weight_decay),
        optax.trace(decay=momentum, nesterov=nesterov)
        if momentum
        else optax.identity(),
        optax.scale(-learning_rate),
    )


def _rmsprop(learning_rate=1e-2, alpha=0.99, eps=1e-8, weight_decay=0.0,
             momentum=0.0, centered=False):
    return optax.chain(
        _maybe_decayed(weight_decay),
        optax.scale_by_rms(decay=alpha, eps=eps) if not centered
        else optax.scale_by_stddev(decay=alpha, eps=eps),
        optax.trace(decay=momentum) if momentum else optax.identity(),
        optax.scale(-learning_rate),
    )


def _adagrad(learning_rate=1e-2, weight_decay=0.0, eps=1e-10,
             initial_accumulator_value=0.0):
    return optax.chain(
        _maybe_decayed(weight_decay),
        optax.scale_by_rss(
            initial_accumulator_value=initial_accumulator_value, eps=eps
        ),
        optax.scale(-learning_rate),
    )


def _adadelta(learning_rate=1.0, rho=0.9, eps=1e-6, weight_decay=0.0):
    return optax.chain(
        _maybe_decayed(weight_decay),
        optax.scale_by_adadelta(rho=rho, eps=eps),
        optax.scale(-learning_rate),
    )


OPTIMIZERS = {
    "Adam": _adam,
    "AdamW": _adamw,
    "SGD": _sgd,
    "RMSprop": _rmsprop,
    "Adagrad": _adagrad,
    "Adadelta": _adadelta,
}


def make_optimizer(name: str, args: Dict[str, Any]) -> optax.GradientTransformation:
    """Build an optimizer from a config ``{"name": ..., "args": {...}}`` entry.

    The returned transformation exposes ``opt_state.hyperparams["learning_rate"]``
    for host-side LR control (see :func:`set_learning_rate`).
    """
    if name not in OPTIMIZERS:
        raise ValueError(f"Unknown optimizer '{name}'. Available: {sorted(OPTIMIZERS)}")
    factory = OPTIMIZERS[name]
    args = dict(args or {})
    if "lr" in args:  # torch spells it lr
        args["learning_rate"] = args.pop("lr")
    if "betas" in args:
        args["betas"] = tuple(args["betas"])
    # only learning_rate is injected; everything else is baked into the chain
    static = {k: v for k, v in args.items() if k != "learning_rate"}
    lr = args.get("learning_rate", _default_lr(factory))

    def build(learning_rate):
        return factory(learning_rate=learning_rate, **static)

    return optax.inject_hyperparams(build)(learning_rate=lr)


def _default_lr(factory) -> float:
    import inspect

    return inspect.signature(factory).parameters["learning_rate"].default


def set_learning_rate(opt_state, learning_rate: float):
    """Return opt_state with a new learning rate (host-side, no recompile)."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(
        learning_rate, dtype=jnp.asarray(hp["learning_rate"]).dtype
    )
    return opt_state._replace(hyperparams=hp)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])
