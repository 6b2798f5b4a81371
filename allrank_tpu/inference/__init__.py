"""Inference: on-device slate ranking + clicked-slate metrics."""

from allrank_tpu.inference.inference_utils import (  # noqa: F401
    metrics_on_clicked_slates,
    rank_slates,
    rank_slates_dataset,
)
