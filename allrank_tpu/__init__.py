"""allrank-tpu: a TPU-native listwise learning-to-rank framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of allegro/allRank
(reference: /root/reference). The compute path is jit-compiled XLA with
static shapes, bf16-capable towers and mask-weighted dense loss formulations;
scaling is via `jax.sharding.Mesh` + NamedSharding data parallelism.
"""

__version__ = "0.1.0"

from allrank_tpu.constants import PADDED_Y_VALUE, PADDED_INDEX_VALUE  # noqa: F401
