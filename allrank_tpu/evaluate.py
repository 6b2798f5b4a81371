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

Multi-host: runs the same pod path as training — each process assembles
only its own global-batch rows (process_local_rows), the jitted eval step
reduces over the global data axis, every process observes identical
metrics, and ONLY the coordinator writes evaluation_result.json (pinned by
tests/test_multiprocess_cli.py).
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
    parser.add_argument("--quantize", default=None,
                        choices=["int8", "int8_static"],
                        help="evaluate the checkpoint through the w8a8 int8 "
                             "tower (quant.py) — measures the serving-time "
                             "quantization quality delta offline. "
                             "'int8_static' runs a calibration pass first "
                             "(static activation scales, the production "
                             "serving mode) and writes act_scales.json")
    parser.add_argument("--calibration-role", default="train",
                        help="dataset role the int8_static calibration "
                             "batches are drawn from")
    parser.add_argument("--calibration-batches", type=int, default=8,
                        help="number of batches for int8_static calibration")
    return parser.parse_args()


def run(args: Namespace = None) -> dict:
    args = args or parse_args()
    np.random.seed(42)
    from allrank_tpu.main import _setup_compilation_cache
    from allrank_tpu.parallel import distributed_init

    _setup_compilation_cache()
    distributed_init()
    is_main_process = jax.process_index() == 0

    paths = PathsContainer.from_args(args.job_dir, args.run_id,
                                     args.config_file_name)
    create_output_dirs(paths.output_dir)
    logger = init_logger(paths.output_dir)

    config = Config.from_json(paths.config_path)
    logger.info("Config: %s", pformat(config))
    if is_main_process:
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

    quantize = getattr(args, "quantize", None)
    forward_fn = None
    if quantize in ("int8", "int8_static"):
        from allrank_tpu.quant import quantize_model, quantized_forward

        act_scales = None
        if quantize == "int8_static":
            from allrank_tpu.quant import (calibrate_activations,
                                           calibration_batches_from_dataset)

            calib_role = getattr(args, "calibration_role", "train")
            if calib_role in datasets:
                calib_ds = datasets[calib_role][0]
            else:
                calib_ds = load_dataset_role(
                    calib_role, config.data.path, config.data.slate_length,
                    binary_cache=getattr(config.data, "binary_cache",
                                         False))[0]
            batches = calibration_batches_from_dataset(
                calib_ds, config.data.slate_length, config.data.batch_size,
                getattr(args, "calibration_batches", 8))
            act_scales = calibrate_activations(params, mdef, batches)
            logger.info("calibrated %d activation sites on %d '%s' batches",
                        len(act_scales), len(batches), calib_role)
            if is_main_process:
                with open(os.path.join(paths.output_dir,
                                       "act_scales.json"), "w") as f:
                    json.dump(act_scales, f, indent=1)
        import jax.numpy as jnp

        params = quantize_model(params, mdef, act_scales=act_scales)
        # elementwise flow follows the config's compute dtype so the gate
        # measures the same tower configuration that serves
        q_dtype = jnp.dtype(config.training.compute_dtype or "float32")
        forward_fn = lambda p, x, m, i: quantized_forward(  # noqa: E731
            p, mdef, x, m, i, compute_dtype=q_dtype)
        logger.info("evaluating through the %s w8a8 quantized tower "
                    "(%s elementwise flow)", quantize, q_dtype.name)
    elif quantize is not None:
        raise ValueError(f"unknown quantize mode '{quantize}'")

    # the training pod path: params laid out over the mesh, the global batch
    # sharded over 'data', each process assembling only its own rows
    from allrank_tpu.data.batching import DevicePrefetcher
    from allrank_tpu.parallel import (batch_shardings, make_mesh,
                                      param_shardings, process_local_rows)

    mesh = make_mesh(config.parallel)
    logger.info("Device mesh: %s over %d devices", dict(mesh.shape), mesh.size)
    params = jax.device_put(params, param_shardings(params, mesh))
    global_batch = config.data.batch_size * mesh.shape["data"]
    local_rows = process_local_rows(global_batch, mesh)
    shardings = batch_shardings(mesh)

    loss_fn, needs_rng = get_loss(config.loss.name)
    device_cache = bool(getattr(config.data, "device_cache", False))
    table_gather = None
    if device_cache:
        from allrank_tpu.data.feature_store import (
            effective_sharding,
            make_table_gather,
        )

        store_sharding = effective_sharding(
            getattr(config.data, "device_cache_sharding", "replicated"),
            mesh)
        table_gather = make_table_gather(mesh, store_sharding)
    eval_step = make_eval_fns(
        mdef, loss_fn, config.loss.args, needs_rng, config.metrics,
        config.training.compute_dtype, table_gather=table_gather,
        forward_fn=forward_fn,
    )
    rng = jax.random.PRNGKey(42)

    results = {}
    for role, (ds, slate_len) in datasets.items():
        table = None
        if device_cache:
            from allrank_tpu.data.feature_store import (
                DeviceFeatureStore,
                resolve_store_dtype,
            )

            table = DeviceFeatureStore(
                ds, mesh, dtype=resolve_store_dtype(
                    getattr(config.data, "device_cache_dtype", "auto"),
                    config.training.compute_dtype,
                ),
                sharding=getattr(config.data, "device_cache_sharding",
                                 "replicated"),
            ).table
        if config.data.eval_buckets > 0:
            batcher = BucketedSlateBatcher(
                ds, global_batch,
                n_buckets=config.data.eval_buckets,
                local_rows=local_rows,
                emit_row_indices=device_cache,
            )
        else:
            batcher = SlateBatcher(ds, slate_len, global_batch,
                                   shuffle=False, local_rows=local_rows,
                                   emit_row_indices=device_cache)
        with mesh:
            metrics, loss = compute_metrics(
                eval_step, params,
                DevicePrefetcher(batcher, shardings=shardings),
                rng, table=table,
            )
        metrics["loss"] = loss
        results[role] = metrics
        logger.info("%s: %s", role,
                    {k: round(v, 6) for k, v in metrics.items()})

    flat = {f"{role}/{k}": v for role, m in results.items()
            for k, v in m.items()}
    out_path = os.path.join(paths.output_dir, "evaluation_result.json")
    if is_main_process:
        with open(out_path, "w") as f:
            json.dump(flat, f, indent=1)
        logger.info("wrote %s", out_path)

    if is_main_process and is_gs_path(args.job_dir):
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
