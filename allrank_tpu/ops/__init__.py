"""TPU-native compute ops: differentiable soft sorting, Sinkhorn scaling,
and (see ``allrank_tpu.ops.pallas``) fused Pallas kernels for the hot paths."""

from allrank_tpu.ops.soft_sort import (  # noqa: F401
    deterministic_neural_sort,
    sample_gumbel,
    sinkhorn_scaling,
    stochastic_neural_sort,
)
