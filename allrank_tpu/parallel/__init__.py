"""Device-mesh parallelism: SPMD data/model parallel execution via jax.sharding.

The reference's only parallelism is single-host ``nn.DataParallel``
(reference: allrank/models/model_utils.py:40-53, allrank/main.py:76-78). The
TPU-native replacement is a ``jax.sharding.Mesh`` with a ``data`` axis (batch
sharding; gradient reduction becomes an XLA all-reduce over ICI) and an
optional ``model`` axis (tensor-parallel sharding of the wide tower matrices).
Everything rides ``jit`` + ``NamedSharding`` — XLA inserts the collectives.
"""

from allrank_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    SEQUENCE_AXIS,
    batch_shardings,
    distributed_init,
    make_mesh,
    param_shardings,
    process_local_rows,
    replicated,
)
