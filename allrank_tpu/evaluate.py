"""Offline evaluation CLI (no reference analog — reference users retrain or
abuse rank_and_click to score a checkpoint).

Computes the configured metrics (and the configured loss) of a trained
checkpoint on any dataset roles, without training:

    python -m allrank_tpu.evaluate --job-dir /out --run-id eval1 \
        --config-file-name config.json --input-model-path model.npz \
        --roles vali,test

Per role: validation shape semantics (pad to the role's longest slate, or
``data.eval_buckets`` bucketed shapes), the same jitted eval step as
training, one ``evaluation_result.json`` with ``<role>/<metric>`` keys.
If the config's ``expected_metrics`` names a listed role, the hard
assert-gate runs against the computed values — the training regression gate
(reference allrank/utils/experiments.py:36-43), applicable offline.
"""

from __future__ import annotations

import json
import os
import shutil
from argparse import ArgumentParser, Namespace
from pprint import pformat

import jax
import numpy as np

from allrank_tpu.config import Config
from allrank_tpu.data.batching import BucketedSlateBatcher, SlateBatcher
from allrank_tpu.data.dataset import load_dataset_role
from allrank_tpu.losses import get_loss
from allrank_tpu.models.factory import init_params, make_model
from allrank_tpu.training.checkpoint import load_params
from allrank_tpu.training.train_utils import compute_metrics, make_eval_fns
from allrank_tpu.utils.args_utils import split_as_strings
from allrank_tpu.utils.experiments import assert_expected_metrics
from allrank_tpu.utils.file_utils import (
    PathsContainer,
    copy_local_to_gs,
    create_output_dirs,
    is_gs_path,
)
from allrank_tpu.utils.ltr_logging import init_logger
from allrank_tpu.utils.python_utils import all_equal


def parse_args() -> Namespace:
    parser = ArgumentParser("allRank-tpu evaluate")
    parser.add_argument("--job-dir", required=True,
                        help="Base output path for all experiments")
    parser.add_argument("--run-id", required=True,
                        help="Name of this evaluation run")
    parser.add_argument("--config-file-name", required=True,
                        help="Path of the json experiment config")
    parser.add_argument("--input-model-path", required=True,
                        help="Path to the .npz checkpoint to score")
    parser.add_argument("--roles", required=True, type=split_as_strings,
                        help="Comma-separated dataset roles to evaluate")
    return parser.parse_args()


def run(args: Namespace = None) -> dict:
    args = args or parse_args()
    np.random.seed(42)
    from allrank_tpu.main import _setup_compilation_cache

    _setup_compilation_cache()

    paths = PathsContainer.from_args(args.job_dir, args.run_id,
                                     args.config_file_name)
    create_output_dirs(paths.output_dir)
    logger = init_logger(paths.output_dir)

    config = Config.from_json(paths.config_path)
    logger.info("Config: %s", pformat(config))
    shutil.copy2(paths.config_path,
                 os.path.join(paths.output_dir, "used_config.json"))

    datasets = {
        role: load_dataset_role(role, config.data.path,
                                config.data.slate_length)
        for role in args.roles
    }
    n_features = [ds.n_features for ds, _ in datasets.values()]
    assert all_equal(n_features), (
        f"Last dimensions of datasets must match but got {n_features}"
    )

    mdef = make_model(config.model, n_features[0])
    params = load_params(init_params(jax.random.PRNGKey(42), mdef),
                         args.input_model_path)
    logger.info("loaded model weights from %s", args.input_model_path)

    loss_fn, needs_rng = get_loss(config.loss.name)
    eval_step = make_eval_fns(
        mdef, loss_fn, config.loss.args, needs_rng, config.metrics,
        config.training.compute_dtype,
    )
    rng = jax.random.PRNGKey(42)

    device_cache = bool(getattr(config.data, "device_cache", False))
    results = {}
    for role, (ds, slate_len) in datasets.items():
        table = None
        if device_cache:
            from allrank_tpu.data.feature_store import (
                DeviceFeatureStore,
                resolve_store_dtype,
            )

            table = DeviceFeatureStore(
                ds, dtype=resolve_store_dtype(
                    getattr(config.data, "device_cache_dtype", "auto"),
                    config.training.compute_dtype,
                ),
            ).table
        if config.data.eval_buckets > 0:
            batcher = BucketedSlateBatcher(
                ds, config.data.batch_size,
                n_buckets=config.data.eval_buckets,
                emit_row_indices=device_cache,
            )
        else:
            batcher = SlateBatcher(ds, slate_len, config.data.batch_size,
                                   shuffle=False,
                                   emit_row_indices=device_cache)
        metrics, loss = compute_metrics(eval_step, params, iter(batcher),
                                        rng, table=table)
        metrics["loss"] = loss
        results[role] = metrics
        logger.info("%s: %s", role,
                    {k: round(v, 6) for k, v in metrics.items()})

    flat = {f"{role}/{k}": v for role, m in results.items()
            for k, v in m.items()}
    out_path = os.path.join(paths.output_dir, "evaluation_result.json")
    with open(out_path, "w") as f:
        json.dump(flat, f, indent=1)
    logger.info("wrote %s", out_path)

    if is_gs_path(args.job_dir):
        copy_local_to_gs(paths.local_base_output_path, args.job_dir)

    # the training gate keys validation expectations as "val" (reference
    # convention, e.g. reproducibility configs); offline that alias means
    # the configured validation_ds_role
    alias = {"val": config.data.validation_ds_role}
    gated_roles = {}
    unmatched = []
    for r, v in (config.expected_metrics or {}).items():
        role = alias.get(r, r)
        if role in results:
            gated_roles[role] = v
        else:
            unmatched.append(r)
    if unmatched:
        logger.warning(
            "expected_metrics entries %s match no evaluated role %s — "
            "gate not applied to them", unmatched, sorted(results))
    if gated_roles:
        assert_expected_metrics(
            {f"{role}_metrics": m for role, m in results.items()},
            gated_roles,
        )
        logger.info("expected_metrics gate passed for roles %s",
                    sorted(gated_roles))
    return results


if __name__ == "__main__":
    run()
