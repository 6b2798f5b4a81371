"""Scoring towers: FC input block, slate Transformer encoder, output head.

Pure functional pytree modules: static architecture definitions (hashable
dataclasses, safe as jit static args) + explicit parameter pytrees + pure
apply functions taking PRNG keys for dropout. No framework magic — the whole
forward is one traced XLA program.
"""

from allrank_tpu.models.factory import LTRModelDef, make_model, init_params  # noqa: F401
from allrank_tpu.models.factory import forward, score, prepare_for_output  # noqa: F401
from allrank_tpu.models.factory import num_params  # noqa: F401
