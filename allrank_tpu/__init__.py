"""allrank-tpu: a TPU-native listwise learning-to-rank framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of allegro/allRank
(reference: /root/reference). The compute path is jit-compiled XLA with
static shapes, bf16-capable towers and mask-weighted dense loss formulations;
scaling is via `jax.sharding.Mesh` + NamedSharding data parallelism.
"""

__version__ = "0.1.0"

from allrank_tpu.constants import PADDED_Y_VALUE, PADDED_INDEX_VALUE  # noqa: F401


def __getattr__(name):
    """Lazy top-level API (keeps `import allrank_tpu` free of jax imports)."""
    import importlib

    api = {
        "Config": ("allrank_tpu.config", "Config"),
        "make_model": ("allrank_tpu.models.factory", "make_model"),
        "init_params": ("allrank_tpu.models.factory", "init_params"),
        "fit": ("allrank_tpu.training", "fit"),
        "get_loss": ("allrank_tpu.losses", "get_loss"),
        "get_metric": ("allrank_tpu.metrics", "get_metric"),
        "ndcg": ("allrank_tpu.metrics", "ndcg"),
        "dcg": ("allrank_tpu.metrics", "dcg"),
        "mrr": ("allrank_tpu.metrics", "mrr"),
        "rank_slates": ("allrank_tpu.inference", "rank_slates"),
        "load_dataset": ("allrank_tpu.data.dataset", "load_dataset"),
    }
    if name in api:
        module, attr = api[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'allrank_tpu' has no attribute '{name}'")
