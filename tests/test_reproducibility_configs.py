"""Every shipped reproducibility config must parse, build its model, and
resolve its loss/optimizer/scheduler from the registries."""

import glob
import os

import jax
import pytest

from allrank_tpu.config import Config
from allrank_tpu.losses import get_loss
from allrank_tpu.models.factory import init_params, make_model, num_params
from allrank_tpu.training import make_optimizer, make_scheduler

CONFIGS = sorted(glob.glob(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "reproducibility", "configs", "*", "*.json",
))) + sorted(glob.glob(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "*.json",
)))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds(path):
    config = Config.from_json(path)
    mdef = make_model(config.model, n_features=136)
    params = init_params(jax.random.PRNGKey(0), mdef)
    assert num_params(params) > 0

    loss_fn, _ = get_loss(config.loss.name)
    assert callable(loss_fn)
    optimizer = make_optimizer(config.optimizer.name, config.optimizer.args)
    assert optimizer is not None
    scheduler = make_scheduler(
        config.lr_scheduler.name, config.lr_scheduler.args,
        float(config.optimizer.args.get("lr", 1e-3)),
    )
    assert scheduler.current_lr > 0
    assert config.metrics  # parsed "<name>_<at>" entries
    if config.click_model is not None:
        from allrank_tpu.utils.python_utils import (
            instantiate_from_recursive_name_args,
        )

        assert instantiate_from_recursive_name_args(config.click_model)
