"""Optimizer registry: config names -> optax transforms.

The reference dispatches optimizer names straight into ``torch.optim``
(reference: allrank/main.py:82), so configs say "Adam", "SGD", ... with torch
argument names. This module maps those names and args onto optax chains with
matching update rules, wrapped in ``optax.inject_hyperparams`` so the host
epoch loop can retune the learning rate between steps (LR schedules, plateau
scheduling) without recompiling the train step.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
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
        # torch adds eps OUTSIDE the sqrt (denom = sqrt(v) + eps); optax's
        # default is inside — eps_in_sqrt=False for exact torch parity
        # (pinned by test_optimizer_parity.py, which caught the difference)
        optax.scale_by_rms(decay=alpha, eps=eps, eps_in_sqrt=False)
        if not centered
        else optax.scale_by_stddev(decay=alpha, eps=eps, eps_in_sqrt=False),
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


class ScaleByTorchNadamState(NamedTuple):
    """State for :func:`scale_by_torch_nadam` (count, 1st/2nd moments, and
    the running product of the mu momentum schedule)."""

    count: jnp.ndarray
    mu: Any
    nu: Any
    mu_product: jnp.ndarray


def scale_by_torch_nadam(b1=0.9, b2=0.999, eps=1e-8, momentum_decay=4e-3):
    """NAdam with torch's exact semantics (``torch.optim.NAdam``).

    optax's own ``nadam`` is Dozat's original formulation; torch adds the
    ``momentum_decay`` schedule ``mu_t = b1 * (1 - 0.5 * 0.96^(t * psi))``
    and tracks the running ``mu_product``. Trajectory parity vs torch is
    pinned by tests/training/test_optimizer_parity.py (<=1e-9 over 10 steps
    in fp64).
    """

    def init_fn(params):
        mu = jax.tree.map(jnp.zeros_like, params)
        nu = jax.tree.map(jnp.zeros_like, params)
        prod_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        return ScaleByTorchNadamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu,
            mu_product=jnp.ones([], prod_dtype),
        )

    def update_fn(updates, state, params=None):
        del params
        t = state.count + 1
        tf = t.astype(state.mu_product.dtype)
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (tf * momentum_decay))
        mu_next = b1 * (1.0 - 0.5 * 0.96 ** ((tf + 1.0) * momentum_decay))
        mu_prod = state.mu_product * mu_t
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        bc2 = 1.0 - b2 ** tf

        def _u(m, v, g):
            vhat = jnp.sqrt(v / bc2) + eps
            return (mu_next * m / ((1.0 - mu_prod * mu_next) * vhat)
                    + (1.0 - mu_t) * g / ((1.0 - mu_prod) * vhat))

        upd = jax.tree.map(_u, mu, nu, updates)
        return upd, ScaleByTorchNadamState(count=t, mu=mu, nu=nu,
                                           mu_product=mu_prod)

    return optax.GradientTransformation(init_fn, update_fn)


def _nadam(learning_rate=2e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0,
           momentum_decay=4e-3):
    return optax.chain(
        _maybe_decayed(weight_decay),
        scale_by_torch_nadam(b1=betas[0], b2=betas[1], eps=eps,
                             momentum_decay=momentum_decay),
        optax.scale(-learning_rate),
    )


def _radam(learning_rate=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    # torch.optim.RAdam == the RAdam paper == optax.scale_by_radam at
    # threshold 5 (parity pinned by test_optimizer_parity.py).
    return optax.chain(
        _maybe_decayed(weight_decay),
        optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps, threshold=5.0),
        optax.scale(-learning_rate),
    )


OPTIMIZERS = {
    "Adam": _adam,
    "AdamW": _adamw,
    "SGD": _sgd,
    "RMSprop": _rmsprop,
    "Adagrad": _adagrad,
    "Adadelta": _adadelta,
    "NAdam": _nadam,
    "RAdam": _radam,
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
