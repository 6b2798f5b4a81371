"""Rank-and-click CLI (reference: allrank/rank_and_click.py:26-105).

Loads a trained checkpoint, ranks every slate of the requested dataset roles
on-device, applies the configured click model (host-side numpy), writes
click-through datasets back to libsvm, and dumps per-slate DCG/NDCG stats to
CSV.

Usage::

    python -m allrank_tpu.rank_and_click --job-dir /out --run-id clicks \
        --config-file-name config.json --input-model-path model.npz \
        --roles train,vali
"""

from __future__ import annotations

import os
import shutil
from argparse import ArgumentParser, Namespace
from pprint import pformat

import jax
import numpy as np
import pandas as pd

from allrank_tpu.click_models.click_utils import click_on_slates
from allrank_tpu.config import Config
from allrank_tpu.data.dataset import load_dataset_role
from allrank_tpu.data.saving import write_to_libsvm_without_masked
from allrank_tpu.inference import metrics_on_clicked_slates, rank_slates
from allrank_tpu.models.factory import init_params, make_model
from allrank_tpu.training.checkpoint import load_params
from allrank_tpu.utils.args_utils import split_as_strings
from allrank_tpu.utils.file_utils import (
    PathsContainer,
    copy_local_to_gs,
    create_output_dirs,
    is_gs_path,
)
from allrank_tpu.utils.ltr_logging import init_logger
from allrank_tpu.utils.python_utils import (
    all_equal,
    instantiate_from_recursive_name_args,
)


def parse_args() -> Namespace:
    parser = ArgumentParser("allRank-tpu rank and apply click model")
    parser.add_argument("--job-dir", required=True,
                        help="Base output path for all experiments")
    parser.add_argument("--run-id", required=True,
                        help="Name of this run (must be unique within output dir)")
    parser.add_argument("--config-file-name", required=True,
                        help="Path of the json experiment config")
    parser.add_argument("--input-model-path", required=True,
                        help="Path to the .npz checkpoint to load")
    parser.add_argument("--roles", required=True, type=split_as_strings,
                        help="Comma-separated dataset roles to load and process")
    return parser.parse_args()


def run(args: Namespace = None) -> dict:
    args = args or parse_args()
    np.random.seed(42)
    from allrank_tpu.main import _setup_compilation_cache
    from allrank_tpu.parallel import distributed_init

    _setup_compilation_cache()
    # multi-host: ranking+clicking is cheap relative to training, so every
    # process computes the full (deterministic, seeded) result redundantly —
    # no cross-host reduction to get wrong — and ONLY the coordinator writes
    # the libsvm/CSV artifacts (exactly-once, byte-equal to single-process;
    # pinned by tests/test_multiprocess_cli.py)
    distributed_init()
    is_main_process = jax.process_index() == 0

    paths = PathsContainer.from_args(args.job_dir, args.run_id, args.config_file_name)
    os.makedirs(paths.base_output_path, exist_ok=True)
    create_output_dirs(paths.output_dir)
    logger = init_logger(paths.output_dir)
    logger.info("will save data in %s", paths.base_output_path)

    config = Config.from_json(paths.config_path)
    logger.info("Config: %s", pformat(config))
    if is_main_process:  # coordinator-only artifact write, like the others
        shutil.copy2(paths.config_path,
                     os.path.join(paths.output_dir, "used_config.json"))

    datasets = {
        role: load_dataset_role(
            role, config.data.path, config.data.slate_length,
            binary_cache=getattr(config.data, "binary_cache", False))
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

    assert config.click_model is not None, (
        "click_model must be defined in config for this run"
    )
    click_model = instantiate_from_recursive_name_args(config.click_model)

    # click models with a vectorized equivalent run fused with the ranking
    # pass in one jitted program per batch — clicks never leave the device.
    # data.device_cache additionally switches to index-mode ranking: features
    # live in HBM, batches move [B, L] row ids, and the host re-materializes
    # ranked rows from its own arrays (no [B, L, F] interconnect round-trips)
    from allrank_tpu.click_models.jax_models import as_device_click_fn
    from allrank_tpu.inference.inference_utils import (
        rank_and_click_dataset,
        rank_and_click_dataset_indexed,
        rank_slates_dataset_indexed,
    )

    device_cache = bool(getattr(config.data, "device_cache", False))
    device_click_fn = as_device_click_fn(click_model)
    if device_click_fn is not None:
        rank_click = (rank_and_click_dataset_indexed if device_cache
                      else rank_and_click_dataset)
        logger.info("click model runs on-device (fused with ranking%s)",
                    ", index-mode feed" if device_cache else "")
        clicked_slates = {
            role: rank_click(
                ds, slate_len, params, mdef, config.data.batch_size,
                device_click_fn, include_empty=False,
            )
            for role, (ds, slate_len) in datasets.items()
        }
    else:
        if device_cache:
            logger.info("index-mode ranking (device feature store)")
            ranked_slates = {
                role: rank_slates_dataset_indexed(
                    ds, slate_len, params, mdef, config.data.batch_size
                )
                for role, (ds, slate_len) in datasets.items()
            }
        else:
            ranked_slates = rank_slates(
                datasets, params, mdef, config.data.batch_size
            )
        clicked_slates = {
            role: click_on_slates(slates, click_model, include_empty=False)
            for role, slates in ranked_slates.items()
        }

    if is_main_process:
        for role, slates in clicked_slates.items():
            write_to_libsvm_without_masked(
                os.path.join(paths.output_dir, f"{role}.txt"), *slates
            )

    summaries = {}
    for role, slates in clicked_slates.items():
        metrics_df = pd.DataFrame(metrics_on_clicked_slates(slates))
        logger.info("%s metrics summary:", role)
        logger.info(metrics_df.mean())
        if is_main_process:
            metrics_df.to_csv(
                os.path.join(paths.output_dir, f"{role}_metrics.csv"),
                index=False,
            )
            pd.DataFrame(metrics_df.mean()).T.to_csv(
                os.path.join(paths.output_dir, f"{role}_metrics_mean.csv"),
                index=False,
            )
        summaries[role] = metrics_df.mean().to_dict()

    if is_main_process and is_gs_path(args.job_dir):
        copy_local_to_gs(paths.local_base_output_path, args.job_dir)
    return summaries


if __name__ == "__main__":
    run()
