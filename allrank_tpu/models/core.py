"""Core functional NN primitives: dense, layer norms, dropout, activations.

Activation names intentionally match the torch.nn.modules.activation class
names the reference dispatches on (reference: allrank/models/model.py:28-29)
so configs carry over verbatim.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

ACTIVATIONS = {
    "ReLU": jax.nn.relu,
    "ReLU6": lambda x: jnp.minimum(jax.nn.relu(x), 6.0),
    "Sigmoid": jax.nn.sigmoid,
    "Tanh": jnp.tanh,
    "GELU": jax.nn.gelu,
    "ELU": jax.nn.elu,
    "LeakyReLU": lambda x: jax.nn.leaky_relu(x, 0.01),
    "SELU": jax.nn.selu,
    "CELU": jax.nn.celu,
    "SiLU": jax.nn.silu,
    "Mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "Softplus": jax.nn.softplus,
    "Softsign": jax.nn.soft_sign,
    "Hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
    "Hardsigmoid": jax.nn.hard_sigmoid,
    "Identity": lambda x: x,
}


def get_activation(name: Optional[str]):
    if name is None:
        return lambda x: x
    if name not in ACTIVATIONS:
        raise ValueError(f"Unknown activation '{name}'. Available: {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[name]


def xavier_uniform(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Glorot/fan-avg uniform — the init the reference applies to every
    parameter with dim > 1 (reference: allrank/models/model.py:147-150)."""
    fan_in, fan_out = shape[-2], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def dense_init(key: jax.Array, d_in: int, d_out: int) -> dict:
    return {
        "w": xavier_uniform(key, (d_in, d_out)),
        "b": jnp.zeros((d_out,), dtype=jnp.float32),
    }


def dense_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype) + b


def layer_norm_init(dim: int) -> dict:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm_apply(params: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.LayerNorm semantics: (x - mean) / sqrt(biased_var + eps)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = params["scale"] * out + params["bias"]
    return out.astype(x.dtype)


def std_layer_norm_apply(params: dict, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """The reference encoder's custom LayerNorm: a*(x-mean)/(std+eps)+b with
    *unbiased* std (reference: allrank/models/transformer.py:59-81)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    n = x.shape[-1]
    var = jnp.sum((x32 - mean) ** 2, axis=-1, keepdims=True) / max(n - 1, 1)
    # grad-safe sqrt: padded docs (and batch-padding dummy slates) have
    # all-zero rows -> var == 0, where d/dvar sqrt(var) = inf would poison the
    # whole batch's gradients via the mask-weighted loss (NaN * 0 = NaN). The
    # floor is ~1e-12 in std units — invisible next to the 1e-6 eps.
    out = (x32 - mean) / (jnp.sqrt(jnp.maximum(var, 1e-24)) + eps)
    out = params["scale"] * out + params["bias"]
    return out.astype(x.dtype)


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float, train: bool):
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
