"""Framework-wide constants.

Mirrors the padding contract of the reference framework
(reference: allrank/data/dataset_loading.py:15-16): a slate batch is
(x [B, L, F] float32, y [B, L] float32, indices [B, L] int32) where
padded documents carry y == PADDED_Y_VALUE and indices == PADDED_INDEX_VALUE.
The padding mask is always recomputed at the point of use as
``y == PADDED_Y_VALUE``.
"""

PADDED_Y_VALUE = -1
PADDED_INDEX_VALUE = -1

# Epsilon shared by the loss zoo (reference: allrank/models/losses/__init__.py:1).
DEFAULT_EPS = 1e-10

# Large-negative fill used in place of -inf where downstream bf16 kernels
# could overflow; fp32 loss math still uses true -inf where the reference does.
NEG_INF_FILL = -1e9
