"""Train CLI (reference: allrank/main.py:24-110).

Usage::

    python -m allrank_tpu.main --config-file-name config.json \
        --run-id my_run --job-dir /tmp/output

Pipeline: parse args -> load JSON config -> load libsvm train/val slates ->
build model + optimizer + loss + scheduler by name -> ``fit`` (jitted SPMD
steps over the device mesh) -> dump experiment_result.json -> optional GCS
sync -> hard-assert expected_metrics (the built-in regression gate).
"""

from __future__ import annotations

import os
from argparse import ArgumentParser, Namespace
from pprint import pformat

import jax
import numpy as np

from allrank_tpu.config import Config
from allrank_tpu.data.batching import BucketedSlateBatcher, SlateBatcher
from allrank_tpu.data.dataset import load_dataset
from allrank_tpu.losses import accumulation_weighting, get_loss
from allrank_tpu.models.factory import init_params, make_model, num_params
from allrank_tpu.parallel import (
    batch_shardings,
    distributed_init,
    make_mesh,
    param_shardings,
    process_local_rows,
)
from allrank_tpu.training import fit, make_optimizer, make_scheduler
from allrank_tpu.utils.experiments import (
    assert_expected_metrics,
    dump_experiment_result,
)
from allrank_tpu.utils.file_utils import (
    PathsContainer,
    copy_local_to_gs,
    create_output_dirs,
    is_gs_path,
)
from allrank_tpu.utils.ltr_logging import init_logger
from allrank_tpu.utils.tensorboard_utils import TensorboardSummaryWriter


def parse_args() -> Namespace:
    parser = ArgumentParser("allRank-tpu")
    parser.add_argument(
        "--job-dir", help="Base output path for all experiments", required=True
    )
    parser.add_argument(
        "--run-id", help="Name of this run (subdirectory of job-dir)", required=True
    )
    parser.add_argument(
        "--config-file-name", required=True, help="Path to the experiment JSON config"
    )
    return parser.parse_args()


def _setup_compilation_cache() -> None:
    """Persistent XLA compilation cache (ALLRANK_TPU_CACHE_DIR, default
    ~/.cache/allrank_tpu_xla). Kernel-heavy steps (fused Sinkhorn/attention)
    can take minutes to compile on remote-compile runtimes; the cache makes
    repeat runs instant."""
    cache_dir = os.environ.get(
        "ALLRANK_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "allrank_tpu_xla"),
    )
    if cache_dir and cache_dir != "0":
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # min compile time gating what gets persisted; env-overridable so
        # tests (and latency-sensitive deploys) can cache everything
        min_secs = float(os.environ.get("ALLRANK_TPU_CACHE_MIN_COMPILE_SECS", "1.0"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def run(args: Namespace = None) -> dict:
    args = args or parse_args()
    np.random.seed(42)
    _setup_compilation_cache()
    distributed_init()

    paths = PathsContainer.from_args(args.job_dir, args.run_id, args.config_file_name)
    create_output_dirs(paths.output_dir)
    logger = init_logger(paths.output_dir)
    logger.info("created paths container %s", paths)

    config = Config.from_json(paths.config_path)
    logger.info("Config: %s", pformat(config))
    import shutil

    shutil.copy2(
        paths.config_path, os.path.join(paths.output_dir, "used_config.json")
    )

    if config.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    train_ds, train_len, val_ds, val_len = load_dataset(
        config.data.path, config.data.slate_length,
        config.data.validation_ds_role,
        binary_cache=getattr(config.data, "binary_cache", False),
    )
    n_features = train_ds.n_features
    assert n_features == val_ds.n_features, "train/val feature size mismatch!"

    mesh = make_mesh(config.parallel)
    logger.info(
        "Device mesh: %s over %d devices", dict(mesh.shape), mesh.size
    )
    n_data_shards = mesh.shape["data"]
    # DataParallel convention of the reference (dataset_loading.py:239-242):
    # global batch = n_parallel_units * config batch size.
    global_batch = config.data.batch_size * n_data_shards

    # Multi-host: each process assembles only the global-batch rows its own
    # devices hold under the P('data') sharding; the prefetcher stitches them
    # into global arrays (no duplicated or dropped slates across the pod).
    local_rows = process_local_rows(global_batch, mesh)
    device_cache = bool(getattr(config.data, "device_cache", False))
    train_store = val_store = None
    if device_cache:
        from allrank_tpu.data.feature_store import (
            DeviceFeatureStore,
            resolve_store_dtype,
        )

        store_dtype = resolve_store_dtype(
            getattr(config.data, "device_cache_dtype", "auto"),
            config.training.compute_dtype,
        )
        store_sharding = getattr(config.data, "device_cache_sharding",
                                 "replicated")
        train_store = DeviceFeatureStore(train_ds, mesh, dtype=store_dtype,
                                         sharding=store_sharding)
        val_store = DeviceFeatureStore(val_ds, mesh, dtype=store_dtype,
                                       sharding=store_sharding)
        logger.info(
            "device feature store: train %s, val %s rows resident in HBM"
            " (dtype %s, %s)",
            train_store.sentinel, val_store.sentinel,
            store_dtype or "float32", train_store.sharding,
        )
    train_batcher = SlateBatcher(
        train_ds, train_len, global_batch, shuffle=True,
        seed=config.data.shuffle_seed, local_rows=local_rows,
        num_workers=config.data.num_workers, emit_row_indices=device_cache,
    )
    if config.data.eval_buckets > 0:
        val_batcher = BucketedSlateBatcher(
            val_ds, global_batch, n_buckets=config.data.eval_buckets,
            local_rows=local_rows, num_workers=config.data.num_workers,
            emit_row_indices=device_cache,
        )
        logger.info(
            "bucketed eval shapes: %s",
            [(length, len(idx)) for length, idx in val_batcher.buckets],
        )
    else:
        val_batcher = SlateBatcher(
            val_ds, val_len, global_batch, shuffle=False,
            seed=config.data.shuffle_seed, local_rows=local_rows,
            num_workers=config.data.num_workers, emit_row_indices=device_cache,
        )

    mdef = make_model(config.model, n_features)
    params = init_params(jax.random.PRNGKey(42), mdef)
    if config.training.init_from:
        from allrank_tpu.training.checkpoint import load_params

        params = load_params(params, config.training.init_from)
        logger.info("warm-started weights from %s", config.training.init_from)
    params = jax.device_put(params, param_shardings(params, mesh))
    logger.info("Model definition: %s (%d params)", mdef, num_params(params))

    optimizer = make_optimizer(config.optimizer.name, config.optimizer.args)
    base_lr = float(config.optimizer.args.get("lr", 1e-3))
    scheduler = make_scheduler(
        config.lr_scheduler.name, config.lr_scheduler.args, base_lr
    )
    loss_fn, needs_rng = get_loss(config.loss.name)

    with mesh:
        result = fit(
            epochs=config.training.epochs,
            params=params,
            mdef=mdef,
            loss_fn=loss_fn,
            loss_kwargs=config.loss.args,
            needs_rng=needs_rng,
            optimizer=optimizer,
            scheduler=scheduler,
            train_batcher=train_batcher,
            val_batcher=val_batcher,
            metrics=config.metrics,
            val_metric=config.val_metric,
            early_stopping_patience=config.training.early_stopping_patience,
            gradient_clipping_norm=config.training.gradient_clipping_norm,
            output_dir=paths.output_dir,
            tensorboard_summary_writer=TensorboardSummaryWriter(
                paths.tensorboard_output_path
            ),
            batch_shardings=batch_shardings(mesh),
            compute_dtype=config.training.compute_dtype,
            checkpoint_every=config.training.checkpoint_every,
            checkpoint_backend=config.training.checkpoint_backend,
            resume=config.training.resume,
            profiler_trace_dir=config.training.profiler_trace_dir,
            metrics_on_train=config.training.metrics_on_train,
            scan_steps=config.training.scan_steps,
            train_feature_table=None if train_store is None else train_store.table,
            val_feature_table=None if val_store is None else val_store.table,
            table_gather=None if train_store is None else train_store.gather,
            accumulation_steps=config.training.accumulation_steps,
            accum_weighting=accumulation_weighting(
                config.loss.name, config.loss.args
            ),
        )

    result_for_dump = {k: v for k, v in result.items() if k != "params"}
    dump_experiment_result(
        args.run_id, config.to_dict(), paths.output_dir, result_for_dump
    )

    if is_gs_path(args.job_dir):
        copy_local_to_gs(paths.local_base_output_path, args.job_dir)

    assert_expected_metrics(result_for_dump, config.expected_metrics)
    return result


if __name__ == "__main__":
    run()
