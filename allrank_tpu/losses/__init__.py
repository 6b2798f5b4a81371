"""The listwise loss zoo: pure jittable functions over [B, L] score/label arrays.

Every loss follows the reference's custom-loss contract
(reference: README.md:64-78, allrank/models/losses/__init__.py): a pure
function ``loss(y_pred, y_true, **kwargs) -> scalar`` where padded documents
carry ``y_true == PADDED_Y_VALUE``.

TPU-first deviations from the reference's torch implementations:
  * All formulations are fixed-shape and mask-weighted — no boolean indexing,
    no data-dependent host logic — so each loss jit-compiles once per shape.
  * Losses with inherent randomness (listMLE tie-shuffle, stochastic
    NeuralNDCG Gumbel samples) take an explicit ``rng`` jax PRNG key.
  * Every loss accepts an optional ``slate_mask [B]`` marking real (True) vs
    batch-padding (False) slates so the training loop can run fixed-size
    batches; with ``slate_mask=None`` semantics match the reference exactly.
"""

from allrank_tpu.constants import DEFAULT_EPS, PADDED_Y_VALUE  # noqa: F401

from allrank_tpu.losses.listnet import listNet, binary_listNet  # noqa: F401
from allrank_tpu.losses.listmle import listMLE  # noqa: F401
from allrank_tpu.losses.ranknet import (  # noqa: F401
    rankNet,
    rankNet_weightByGTDiff,
    rankNet_weightByGTDiff_pow,
)
from allrank_tpu.losses.ordinal import ordinal, with_ordinals  # noqa: F401
from allrank_tpu.losses.pointwise import pointwise_rmse  # noqa: F401
from allrank_tpu.losses.bce import bce  # noqa: F401
from allrank_tpu.losses.lambdaloss import lambdaLoss  # noqa: F401
from allrank_tpu.losses.approxndcg import approxNDCGLoss  # noqa: F401
from allrank_tpu.losses.neuralndcg import neuralNDCG, neuralNDCG_transposed  # noqa: F401

# Registry: config loss names -> (fn, needs_rng). Names match the reference's
# module-namespace dispatch (reference: allrank/main.py:83) so configs carry over.
LOSSES = {
    "listNet": (listNet, False),
    "binary_listNet": (binary_listNet, False),
    "listMLE": (listMLE, True),
    "rankNet": (rankNet, False),
    "rankNet_weightByGTDiff": (rankNet_weightByGTDiff, False),
    "rankNet_weightByGTDiff_pow": (rankNet_weightByGTDiff_pow, False),
    "ordinal": (ordinal, False),
    "pointwise_rmse": (pointwise_rmse, False),
    "bce": (bce, False),
    "lambdaLoss": (lambdaLoss, False),
    "approxNDCGLoss": (approxNDCGLoss, False),
    "neuralNDCG": (neuralNDCG, True),
    "neuralNDCG_transposed": (neuralNDCG_transposed, True),
}


def get_loss(name: str):
    """Return (loss_fn, needs_rng) for a config loss name."""
    if name not in LOSSES:
        raise ValueError(f"Unknown loss '{name}'. Available: {sorted(LOSSES)}")
    return LOSSES[name]


def accumulation_weighting(name: str, args=None):
    """Micro-batch combination rule for gradient accumulation
    (training.accumulation_steps): returns ``(weight_fn, normalize)``.

    The combined loss is ``sum_i(loss_i * w_i) / sum_i(w_i)`` when
    ``normalize`` (w_i from ``weight_fn(y_true_i, slate_mask_i)``) and the
    plain ``sum_i(loss_i)`` otherwise. The rule reproduces each loss's own
    batch normalizer so the accumulated update equals the full-batch one:

      * per-slate-mean losses (listNet, listMLE, pointwise, approxNDCG,
        neuralNDCG, ...): valid-slate count;
      * ordinal: valid-document count; bce: slates-with-any-valid-doc;
      * lambdaLoss with reduction='sum' (the paper configs): plain sum;
      * pair-count-normalized losses (rankNet family, lambdaLoss
        reduction='mean'): the selection depends on predictions, so the
        exact per-micro normalizer is not recoverable outside the loss —
        they use the valid-slate weighting, an equal-pair-density
        approximation (scale-correct; only the relative weighting of
        micro-batches is approximate).
    """
    import jax.numpy as jnp

    args = args or {}

    def slates(y, slate_mask):
        return jnp.sum(slate_mask.astype(jnp.float32))

    def valid_docs(y, slate_mask):
        valid = (y != PADDED_Y_VALUE) & slate_mask[:, None]
        return jnp.sum(valid.astype(jnp.float32))

    def slates_with_valid(y, slate_mask):
        valid = (y != PADDED_Y_VALUE) & slate_mask[:, None]
        return jnp.sum(jnp.any(valid, axis=-1).astype(jnp.float32))

    if name == "lambdaLoss" and args.get("reduction", "sum") == "sum":
        return (lambda y, sm: jnp.float32(1.0)), False
    if name == "ordinal":
        return valid_docs, True
    if name == "bce":
        return slates_with_valid, True
    return slates, True
