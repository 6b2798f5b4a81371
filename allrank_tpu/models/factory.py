"""LTR model assembly: FC tower -> (optional) Transformer -> output head.

Mirrors the reference's composition (reference: allrank/models/model.py:47-151)
as static model definitions + pure init/apply functions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from allrank_tpu.config import ModelConfig
from allrank_tpu.models.core import (
    dense_apply,
    dense_init,
    dropout,
    get_activation,
    layer_norm_apply,
    layer_norm_init,
)
from allrank_tpu.models.transformer import (
    TransformerDef,
    transformer_apply,
    transformer_init,
)


@dataclass(frozen=True)
class FCDef:
    sizes: Tuple[int, ...]
    input_norm: bool
    activation: Optional[str]
    dropout: float
    n_features: int

    @property
    def output_size(self) -> int:
        return self.sizes[-1]


@dataclass(frozen=True)
class OutputDef:
    d_model: int
    d_output: int
    output_activation: Optional[str] = None


@dataclass(frozen=True)
class LTRModelDef:
    """Hashable architecture description — safe as a jit static argument."""

    fc: Optional[FCDef]
    transformer: Optional[TransformerDef]
    output: OutputDef
    n_features: int


def make_model(model_config: ModelConfig, n_features: int) -> LTRModelDef:
    """Build the architecture definition from a parsed config
    (reference: allrank/models/model.py:131-151)."""
    fc = None
    d_model = n_features
    if model_config.fc_model:
        fcc = model_config.fc_model
        fc = FCDef(
            sizes=tuple(fcc.sizes),
            input_norm=fcc.input_norm,
            activation=fcc.activation,
            dropout=float(fcc.dropout or 0.0),
            n_features=n_features,
        )
        d_model = fc.output_size

    transformer = None
    if model_config.transformer:
        tc = model_config.transformer
        pe_strategy = None
        max_indices = 5000
        if tc.positional_encoding:
            pe_strategy = tc.positional_encoding.strategy
            max_indices = tc.positional_encoding.max_indices
        transformer = TransformerDef(
            N=tc.N,
            d_model=d_model,
            d_ff=tc.d_ff,
            h=tc.h,
            dropout=float(tc.dropout or 0.0),
            positional_encoding=pe_strategy,
            max_indices=max_indices,
        )

    output = OutputDef(
        d_model=d_model,
        d_output=model_config.post_model.d_output,
        output_activation=model_config.post_model.output_activation,
    )
    return LTRModelDef(fc=fc, transformer=transformer, output=output,
                       n_features=n_features)


def init_params(key: jax.Array, mdef: LTRModelDef) -> dict:
    k_fc, k_tr, k_out = jax.random.split(key, 3)
    params: dict = {}
    if mdef.fc:
        dims = (mdef.fc.n_features,) + mdef.fc.sizes
        layer_keys = jax.random.split(k_fc, len(mdef.fc.sizes))
        params["fc"] = {
            "layers": [
                dense_init(layer_keys[i], dims[i], dims[i + 1])
                for i in range(len(mdef.fc.sizes))
            ]
        }
        if mdef.fc.input_norm:
            params["fc"]["input_norm"] = layer_norm_init(mdef.fc.n_features)
    if mdef.transformer:
        params["transformer"] = transformer_init(k_tr, mdef.transformer)
    params["output"] = dense_init(k_out, mdef.output.d_model, mdef.output.d_output)
    return params


def _fc_apply(params, fcdef: FCDef, x, train, rng):
    if fcdef.input_norm:
        x = layer_norm_apply(params["input_norm"], x)
    act = get_activation(fcdef.activation)
    n = len(params["layers"])
    rngs = (
        list(jax.random.split(rng, n))
        if (rng is not None and train and fcdef.dropout > 0.0)
        else [None] * n
    )
    for layer, r in zip(params["layers"], rngs):
        x = dropout(r, act(dense_apply(layer, x)), fcdef.dropout, train)
    return x


def prepare_for_output(
    params: dict,
    mdef: LTRModelDef,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    indices: jnp.ndarray,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Input tower + encoder; returns [B, L, d_model] in float32."""
    r_fc = r_tr = None
    if rng is not None:
        r_fc, r_tr = jax.random.split(rng)
    x = x.astype(compute_dtype)
    if mdef.fc:
        x = _fc_apply(params["fc"], mdef.fc, x, train, r_fc)
    if mdef.transformer:
        x = transformer_apply(
            params["transformer"], mdef.transformer, x, mask, indices,
            train=train, rng=r_tr,
        )
    return x.astype(jnp.float32)


def forward(
    params: dict,
    mdef: LTRModelDef,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    indices: jnp.ndarray,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Full model: [B, L, d_output] squeezed to [B, L] when d_output == 1."""
    h = prepare_for_output(params, mdef, x, mask, indices, train, rng, compute_dtype)
    out = dense_apply(params["output"], h)
    if mdef.output.d_output == 1:
        out = jnp.squeeze(out, axis=2)
    return get_activation(mdef.output.output_activation)(out)


def score(
    params: dict,
    mdef: LTRModelDef,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    indices: jnp.ndarray,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Per-document scores [B, L]; multi-output heads sum over d_output
    (how the ordinal head scores — reference model.py:119-128)."""
    out = forward(params, mdef, x, mask, indices, train, rng, compute_dtype)
    if mdef.output.d_output > 1:
        out = jnp.sum(out, axis=-1)
    return out


def num_params(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
