"""Training subsystem: jitted SPMD train/eval steps + host-side epoch loop.

TPU-first split of responsibilities (vs the reference's torch loop,
reference: allrank/training/train_utils.py:18-147): everything per-step is
one compiled XLA program (forward, loss, backward, clip, optimizer update);
everything per-epoch that needs data-dependent control flow (LR plateau
scheduling, early stopping, logging) stays in Python on the host.
"""

from allrank_tpu.training.early_stop import EarlyStop  # noqa: F401
from allrank_tpu.training.optimizers import make_optimizer, set_learning_rate  # noqa: F401
from allrank_tpu.training.schedulers import make_scheduler  # noqa: F401
from allrank_tpu.training.checkpoint import load_params, save_params  # noqa: F401
from allrank_tpu.training.train_utils import (  # noqa: F401
    compute_metrics,
    fit,
    make_eval_fns,
    make_train_step,
)
