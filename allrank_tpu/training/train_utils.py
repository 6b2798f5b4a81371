"""Jitted train/eval steps + the host epoch loop (``fit``).

Redesign of the reference's training loop (reference:
allrank/training/train_utils.py:18-147) around XLA's compilation model:

  * ``train_step`` is ONE compiled program: forward (dropout on), loss,
    backward, global-norm clip, optimizer update. Donated params/opt-state
    buffers update in place on device.
  * ``eval_step`` is ONE compiled program returning the batch's loss sum,
    every configured metric summed over real slates, and the real-slate
    count — so an epoch of evaluation is a stream of tiny device scalars
    with no per-batch host sync (everything is fetched once per epoch).
  * Data parallelism: batches arrive sharded over the mesh's ``data`` axis
    (see parallel/mesh.py); jit's SPMD partitioner turns the gradient mean
    into an ICI all-reduce automatically. The loop itself is
    placement-agnostic.
  * Fixed-size batches: trailing partial batches carry dummy slates masked
    out by ``slate_mask`` — losses/metrics weight them to zero, so jit
    compiles exactly one program shape per role.

Deviation from the reference (documented, metric gates unaffected): train
metrics are computed with dropout OFF. The reference leaves the model in
train mode for its train-split metric pass (train_utils.py:90-99) — a quirk,
not a contract.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.data.batching import DevicePrefetcher, SlateBatch
from allrank_tpu.metrics import get_metric
from allrank_tpu.models.factory import LTRModelDef, forward, num_params
from allrank_tpu.training.checkpoint import save_params
from allrank_tpu.training.early_stop import EarlyStop
from allrank_tpu.training.optimizers import get_learning_rate, set_learning_rate
from allrank_tpu.utils.ltr_logging import get_logger

logger = get_logger()


def _scores_from_forward(preds: jnp.ndarray) -> jnp.ndarray:
    """forward output -> per-doc scores: multi-output heads sum over d_output
    (reference: allrank/models/model.py:119-128)."""
    if preds.ndim == 3:
        return jnp.sum(preds, axis=-1)
    return preds


def _compute_dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def make_train_step(
    mdef: LTRModelDef,
    loss_fn: Callable,
    loss_kwargs: Dict[str, Any],
    needs_rng: bool,
    optimizer: optax.GradientTransformation,
    gradient_clipping_norm: Optional[float],
    compute_dtype: str = "float32",
    scan_steps: int = 1,
    accumulation_steps: int = 1,
    accum_weighting=None,
    table_gather=None,
):
    """Build the jitted train step:
    (params, opt_state, rng, batch) -> (params, opt_state, rng, loss, n_real).

    With ``scan_steps > 1`` the step takes ``scan_steps`` stacked batches
    (leading axis on every SlateBatch leaf) and runs them as one device-side
    ``lax.scan`` — one dispatch per K optimizer steps. Tail groups are padded
    with all-dummy batches whose updates are skipped entirely (an Adam step
    with zero gradients is NOT a no-op, so dummies must not step). Returned
    loss/n_real are [K] arrays.

    With ``accumulation_steps = A > 1`` each batch is processed as A
    sequential micro-batches (a ``lax.scan`` over a [A, B/A, ...] reshape)
    and ONE optimizer step is taken on the combined gradients — the peak
    activation memory of the forward/backward drops ~A× while the update
    matches the full-batch step. Micro losses/gradients combine under
    ``accum_weighting`` — ``(weight_fn(y, slate_mask), normalize)`` from
    ``losses.accumulation_weighting(loss_name, loss_args)`` — which
    reproduces each loss's own batch normalizer (valid slates, valid docs,
    or plain sum for sum-reduction losses like the paper lambdaLoss).
    Defaults to valid-slate weighting (exact for per-slate-mean losses).
    """
    dtype = _compute_dtype(compute_dtype)
    loss_kwargs = dict(loss_kwargs or {})
    accumulation_steps = max(1, int(accumulation_steps or 1))
    if accum_weighting is None:
        accum_weight_fn = lambda y, sm: jnp.sum(sm.astype(jnp.float32))  # noqa: E731
        accum_normalize = True
    else:
        accum_weight_fn, accum_normalize = accum_weighting

    gather = table_gather if table_gather is not None else (
        lambda t, i: jnp.take(t, i, axis=0))

    def one_batch(params, opt_state, rng, batch: SlateBatch, table=None):
        x, y, indices, slate_mask = batch
        if table is not None:
            # device feature store: x is [B, L] int32 rows into the
            # HBM-resident flat matrix (padded slots -> zero sentinel row);
            # replicated tables take locally, sharded ones via the
            # collective gather (feature_store.make_table_gather)
            x = gather(table, x)
        mask = y == PADDED_Y_VALUE
        next_rng, drop_rng, loss_rng = jax.random.split(rng, 3)

        def loss_of(p, xb, mb, ib, yb, sb, d_rng, l_rng):
            preds = forward(
                p, mdef, xb, mb, ib, train=True, rng=d_rng,
                compute_dtype=dtype,
            )
            kw = dict(loss_kwargs)
            if needs_rng:
                kw["rng"] = l_rng
            return loss_fn(preds, yb, slate_mask=sb, **kw)

        if accumulation_steps <= 1:
            loss, grads = jax.value_and_grad(loss_of)(
                params, x, mask, indices, y, slate_mask, drop_rng, loss_rng
            )
        else:
            a = accumulation_steps
            b = x.shape[0]
            if b % a:
                raise ValueError(
                    f"batch_size {b} not divisible by "
                    f"accumulation_steps {a}"
                )

            def micro_split(t):
                return t.reshape(a, b // a, *t.shape[1:])

            stream = (
                micro_split(x), micro_split(mask), micro_split(indices),
                micro_split(y), micro_split(slate_mask),
                jax.random.split(drop_rng, a), jax.random.split(loss_rng, a),
            )

            def micro(carry, inp):
                loss_acc, grads_acc, w_acc = carry
                l, g = jax.value_and_grad(loss_of)(params, *inp)
                # inp[3] = y micro-slice, inp[4] = slate_mask micro-slice
                w = accum_weight_fn(inp[3], inp[4])
                grads_acc = jax.tree.map(
                    lambda ga, gi: ga + gi * w, grads_acc, g
                )
                return (loss_acc + l * w, grads_acc, w_acc + w), None

            init = (
                jnp.zeros(()),
                jax.tree.map(jnp.zeros_like, params),
                jnp.zeros(()),
            )
            (loss_sum, grad_sum, w_sum), _ = jax.lax.scan(micro, init, stream)
            if accum_normalize:
                denom = jnp.maximum(w_sum, 1.0)
                loss = loss_sum / denom
                grads = jax.tree.map(lambda g: g / denom, grad_sum)
            else:
                loss, grads = loss_sum, grad_sum
        if gradient_clipping_norm:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, gradient_clipping_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        n_real = jnp.sum(slate_mask.astype(jnp.float32))
        return params, opt_state, next_rng, loss, n_real

    if scan_steps <= 1:
        return jax.jit(one_batch, donate_argnums=(0, 1, 2))

    def step(params, opt_state, rng, batches: SlateBatch, table=None):
        def body(carry, batch):
            params, opt_state, rng = carry
            new_p, new_o, rng, loss, n_real = one_batch(
                params, opt_state, rng, batch, table
            )
            # all-dummy padding batch: skip the optimizer step entirely
            is_real = jnp.any(batch.slate_mask)
            params = jax.tree.map(
                lambda new, old: jnp.where(is_real, new, old), new_p, params
            )
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(is_real, new, old)
                if hasattr(new, "shape") else new,
                new_o, opt_state,
            )
            return (params, opt_state, rng), (loss, n_real)

        (params, opt_state, rng), (losses, n_reals) = jax.lax.scan(
            body, (params, opt_state, rng), batches
        )
        return params, opt_state, rng, losses, n_reals

    return jax.jit(step, donate_argnums=(0, 1, 2))


def _stack_batches(batches) -> SlateBatch:
    return SlateBatch(*(np.stack(leaves) for leaves in zip(*batches)))


def _dummy_like(batch: SlateBatch) -> SlateBatch:
    return SlateBatch(
        np.zeros_like(batch.x),
        np.full_like(batch.y, float(PADDED_Y_VALUE)),
        np.full_like(batch.indices, PADDED_Y_VALUE),
        np.zeros_like(batch.slate_mask),
    )


def _grouped(batches, k: int):
    """Yield SlateBatches with a leading [k] axis; the tail group is padded
    with all-dummy batches (their updates are skipped in the scan)."""
    buf = []
    for b in batches:
        buf.append(b)
        if len(buf) == k:
            yield _stack_batches(buf)
            buf = []
    if buf:
        buf.extend(_dummy_like(buf[0]) for _ in range(k - len(buf)))
        yield _stack_batches(buf)


def _stacked_shardings(batch_shardings):
    """Lift per-batch shardings to stacked [K, ...] batches (K replicated)."""
    if batch_shardings is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.tree.map(
        lambda s: NamedSharding(s.mesh, P(None, *s.spec)), batch_shardings
    )


def make_eval_fns(
    mdef: LTRModelDef,
    loss_fn: Callable,
    loss_kwargs: Dict[str, Any],
    needs_rng: bool,
    metrics: Dict[str, Sequence[int]],
    compute_dtype: str = "float32",
    table_gather=None,
    forward_fn=None,
):
    """Build the jitted eval step:
    (params, rng, batch) -> ({metric_name_at: sum}, loss_sum, n_real).

    ``forward_fn(params, x, mask, indices)`` overrides the model forward
    (e.g. quant.quantized_forward for int8 offline evaluation — the params
    passed to the step must then be the matching quantized tree).
    """
    dtype = _compute_dtype(compute_dtype)
    loss_kwargs = dict(loss_kwargs or {})
    metric_fns = {name: (get_metric(name), tuple(ats)) for name, ats in metrics.items()}
    gather = table_gather if table_gather is not None else (
        lambda t, i: jnp.take(t, i, axis=0))
    if forward_fn is None:
        def forward_fn(params, x, mask, indices):
            return forward(params, mdef, x, mask, indices, train=False,
                           compute_dtype=dtype)

    def step(params, rng, batch: SlateBatch, table=None):
        x, y, indices, slate_mask = batch
        if table is not None:
            x = gather(table, x)  # device feature store gather
        mask = y == PADDED_Y_VALUE
        preds = forward_fn(params, x, mask, indices)
        kw = dict(loss_kwargs)
        if needs_rng:
            kw["rng"] = rng
        loss = loss_fn(preds, y, slate_mask=slate_mask, **kw)

        scores = _scores_from_forward(preds)
        sw = slate_mask.astype(jnp.float32)
        n_real = jnp.sum(sw)
        sums = {}
        for name, (fn, ats) in metric_fns.items():
            vals = fn(scores, y, ats=ats)  # [B, n_ats]
            weighted = jnp.sum(vals * sw[:, None], axis=0)  # [n_ats]
            for i, at in enumerate(ats):
                sums[f"{name}_{at}"] = weighted[i]
        return sums, loss * n_real, n_real

    return jax.jit(step)


def compute_metrics(
    eval_step,
    params,
    batches,
    rng,
    table=None,
) -> Tuple[Dict[str, float], float]:
    """Run the eval step over a batch stream; returns (metrics dict incl.
    per-slate means, mean loss). Device->host sync happens once, here."""
    totals: Dict[str, Any] = {}
    loss_total = None
    n_total = None
    for batch in batches:
        sums, loss_sum, n_real = eval_step(params, rng, batch, table)
        if n_total is None:
            totals = dict(sums)
            loss_total, n_total = loss_sum, n_real
        else:
            totals = {k: totals[k] + v for k, v in sums.items()}
            loss_total = loss_total + loss_sum
            n_total = n_total + n_real
    if n_total is None:
        raise ValueError("empty batch stream: the evaluation split has no batches")
    n = float(n_total)
    if n == 0.0:
        raise ValueError("evaluation split contains zero real slates")
    return {k: float(v) / n for k, v in totals.items()}, float(loss_total) / n


def epoch_summary(epoch, train_loss, train_metrics, val_loss, val_metrics) -> str:
    """Reference: allrank/training/train_utils.py:60-70."""
    s = f"Epoch : {epoch} Train loss: {train_loss} Val loss: {val_loss} "
    s += " ".join(f"Train {k} {v}" for k, v in train_metrics.items())
    s += " "
    s += " ".join(f"Val {k} {v}" for k, v in val_metrics.items())
    return s


def fit(
    *,
    epochs: int,
    params,
    mdef: LTRModelDef,
    loss_fn: Callable,
    loss_kwargs: Dict[str, Any],
    needs_rng: bool,
    optimizer: optax.GradientTransformation,
    scheduler,
    train_batcher,
    val_batcher,
    metrics: Dict[str, Sequence[int]],
    val_metric: Optional[str],
    early_stopping_patience: int,
    gradient_clipping_norm: Optional[float],
    output_dir: Optional[str] = None,
    tensorboard_summary_writer=None,
    batch_shardings=None,
    compute_dtype: str = "float32",
    seed: int = 42,
    checkpoint_name: str = "model.npz",
    checkpoint_every: Optional[int] = None,
    checkpoint_backend: str = "npz",
    resume: bool = False,
    profiler_trace_dir: Optional[str] = None,
    metrics_on_train: bool = True,
    scan_steps: int = 1,
    accumulation_steps: int = 1,
    accum_weighting=None,
    train_feature_table=None,
    val_feature_table=None,
    table_gather=None,
) -> Dict[str, Any]:
    """The epoch loop (reference: allrank/training/train_utils.py:78-147).

    Host-side responsibilities only: epoch iteration, LR scheduling (incl.
    plateau-on-val-metric), early stopping, logging/tensorboard, final
    checkpoint. All math is inside the two jitted steps.

    Beyond the reference (which only saves a final state_dict):
      * ``checkpoint_every=N`` writes params+optimizer state+loop state under
        ``<output_dir>/partial/`` every N epochs; ``resume=True`` restores
        them and continues from the next epoch.
      * ``profiler_trace_dir`` captures a ``jax.profiler`` device trace of
        epoch 1 (skipping epoch 0's compilation) for xprof/tensorboard.
    """
    rng = jax.random.PRNGKey(seed)
    rng, step_rng = jax.random.split(rng)
    # multi-host: every process runs the same jitted computation; only the
    # coordinator writes artifacts (checkpoints, tensorboard)
    is_main_process = jax.process_index() == 0

    scan_steps = max(1, int(scan_steps or 1))
    train_step = make_train_step(
        mdef, loss_fn, loss_kwargs, needs_rng, optimizer,
        gradient_clipping_norm, compute_dtype, scan_steps=scan_steps,
        accumulation_steps=accumulation_steps,
        accum_weighting=accum_weighting,
        table_gather=table_gather,
    )
    eval_step = make_eval_fns(
        mdef, loss_fn, loss_kwargs, needs_rng, metrics, compute_dtype,
        table_gather=table_gather,
    )

    opt_state = optimizer.init(params)
    if val_metric is None:
        first_name = next(iter(metrics))
        val_metric = f"{first_name}_{metrics[first_name][0]}"
    early_stop = EarlyStop(early_stopping_patience)

    train_metrics: Dict[str, float] = {}
    val_metrics: Dict[str, float] = {}

    def prefetch(batcher):
        return DevicePrefetcher(batcher, shardings=batch_shardings)

    import os

    partial_dir = os.path.join(output_dir, "partial") if output_dir else None
    orbax_ckptr = None
    if checkpoint_backend == "orbax":
        from allrank_tpu.training.orbax_checkpoint import OrbaxTrainCheckpointer

        orbax_ckptr = OrbaxTrainCheckpointer()
    elif checkpoint_backend != "npz":
        raise ValueError(
            f"unknown checkpoint_backend '{checkpoint_backend}'"
            " (expected 'npz' or 'orbax')"
        )
    start_epoch = 0
    loop_state = None
    if resume and partial_dir:
        import json

        from allrank_tpu.training.checkpoint import load_params as _load

        if orbax_ckptr is not None and orbax_ckptr.exists(partial_dir):
            # collective: every process restores (orbax syncs internally);
            # the snapshot's own sidecar carries the loop state, so a crash
            # between an old loop_state.json and a newer in-flight write can
            # never desynchronize arrays from host state
            params, opt_state, _ck_epoch, loop_state = (
                orbax_ckptr.restore_latest(partial_dir, params, opt_state)
            )
        elif os.path.exists(os.path.join(partial_dir, "loop_state.json")):
            params = _load(params, os.path.join(partial_dir, "params.npz"))
            opt_state = _load(
                opt_state, os.path.join(partial_dir, "opt_state.npz"),
                strict=False,
            )
            with open(os.path.join(partial_dir, "loop_state.json")) as f:
                loop_state = json.load(f)
    if loop_state is not None:
        start_epoch = loop_state["epoch"] + 1
        if scheduler is not None:
            scheduler.__dict__.update(loop_state["scheduler"])
        early_stop.__dict__.update(loop_state["early_stop"])
        # restore the PRNG streams for bit-reproducible continuation
        if "step_rng" in loop_state:
            step_rng = jnp.asarray(loop_state["step_rng"], dtype=jnp.uint32)
            rng = jnp.asarray(loop_state["rng"], dtype=jnp.uint32)
        logger.info("resumed from %s at epoch %d", partial_dir, start_epoch)

    def _json_safe(d: dict) -> dict:
        # scheduler state travels through loop_state.json; drop callables
        # (e.g. LambdaLR.lr_lambda — rebuilt from config on restart) and
        # keep only the resumable numeric/str fields
        return {k: v for k, v in d.items()
                if isinstance(v, (int, float, str, bool, list, type(None)))}

    def _loop_state(epoch: int) -> dict:
        return {
            "epoch": epoch,
            "scheduler": _json_safe(scheduler.__dict__) if scheduler else {},
            "early_stop": dict(early_stop.__dict__),
            "step_rng": np.asarray(step_rng).tolist(),
            "rng": np.asarray(rng).tolist(),
        }

    def save_partial(epoch: int) -> None:
        import json

        from allrank_tpu.training.checkpoint import save_opt_state, save_params as _save

        if is_main_process:
            os.makedirs(partial_dir, exist_ok=True)
        if orbax_ckptr is not None:
            # collective + async: every process calls save (each writes its
            # own shards); device->host copies happen here and the file
            # write continues in the background while the loop keeps
            # stepping. Snapshots are epoch-dirs with sidecars — the
            # previous committed snapshot survives until this one commits.
            orbax_ckptr.save(partial_dir, params, opt_state, epoch,
                             loop_state=_loop_state(epoch),
                             is_main_process=is_main_process)
            return
        if not is_main_process:
            return
        _save(params, os.path.join(partial_dir, "params.npz"))
        save_opt_state(opt_state, os.path.join(partial_dir, "opt_state.npz"))
        with open(os.path.join(partial_dir, "loop_state.json"), "w") as f:
            json.dump(_loop_state(epoch), f)

    num_epochs_run = start_epoch
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        if profiler_trace_dir is not None and epoch == 1:
            # best-effort: remote/tunneled TPU runtimes (axon/proxy/pathways)
            # hang in start_trace — skip there rather than break training
            import os as _os

            if any(p in _os.environ.get("JAX_PLATFORMS", "")
                   for p in ("axon", "proxy", "pathways")):
                logger.warning("profiler tracing unsupported on tunneled "
                               "runtime; skipping")
                profiler_trace_dir = None
            else:
                try:
                    jax.profiler.start_trace(profiler_trace_dir)
                except Exception as e:  # pragma: no cover
                    logger.warning("profiler trace unavailable: %s", e)
                    profiler_trace_dir = None
        logger.info("Current learning rate: %s", get_learning_rate(opt_state))

        train_batcher.set_epoch(epoch)
        loss_total = None
        n_total = None
        if scan_steps > 1:
            train_stream = DevicePrefetcher(
                _grouped(train_batcher, scan_steps),
                shardings=_stacked_shardings(batch_shardings),
            )
        else:
            train_stream = prefetch(train_batcher)
        for batch in train_stream:
            params, opt_state, step_rng, loss, n_real = train_step(
                params, opt_state, step_rng, batch, train_feature_table
            )
            # with scan_steps > 1, loss/n_real are [K] arrays — the same
            # weighted accumulation applies elementwise before the sum
            if n_total is None:
                loss_total, n_total = jnp.sum(loss * n_real), jnp.sum(n_real)
            else:
                loss_total = loss_total + jnp.sum(loss * n_real)
                n_total = n_total + jnp.sum(n_real)
        train_loss = float(loss_total) / float(n_total)
        t_train = time.time() - t0

        eval_rng = jax.random.fold_in(rng, epoch)
        if metrics_on_train:
            train_metrics, _ = compute_metrics(
                eval_step, params, prefetch(train_batcher), eval_rng,
                table=train_feature_table,
            )
        t_eval0 = time.time()
        val_metrics, val_loss = compute_metrics(
            eval_step, params, prefetch(val_batcher), eval_rng,
            table=val_feature_table,
        )
        logger.info("epoch %d phases: train %.1fs, val eval %.1fs",
                    epoch, t_train, time.time() - t_eval0)

        logger.info(
            "%s [%.1fs]",
            epoch_summary(epoch, train_loss, train_metrics, val_loss, val_metrics),
            time.time() - t0,
        )

        if tensorboard_summary_writer is not None and is_main_process:
            tb = {("train", "loss"): train_loss, ("val", "loss"): val_loss}
            tb.update({("train", k): v for k, v in train_metrics.items()})
            tb.update({("val", k): v for k, v in val_metrics.items()})
            tensorboard_summary_writer.save_to_tensorboard(tb, epoch)

        current_val = val_metrics[val_metric]
        if scheduler is not None:
            lr = scheduler.step(current_val if scheduler.needs_metric else None)
            opt_state = set_learning_rate(opt_state, lr)

        if profiler_trace_dir is not None and epoch == 1:
            try:
                jax.profiler.stop_trace()
                logger.info("profiler trace of epoch 1 written to %s",
                            profiler_trace_dir)
            except Exception as e:  # pragma: no cover
                logger.warning("profiler stop_trace failed: %s", e)
                profiler_trace_dir = None

        early_stop.step(current_val, epoch)
        num_epochs_run = epoch + 1
        # orbax saves are multi-process collectives — every process calls;
        # save_partial itself keeps the file-writing on the main process
        if (checkpoint_every and partial_dir
                and (is_main_process or orbax_ckptr is not None)
                and (epoch + 1) % checkpoint_every == 0):
            save_partial(epoch)
        if early_stop.stop_training(epoch):
            logger.info(
                "early stopping at epoch %d since %s didn't improve from epoch "
                "%d. Best value %s",
                epoch, val_metric, early_stop.best_epoch, early_stop.best_value,
            )
            break

    if tensorboard_summary_writer is not None:
        tensorboard_summary_writer.close_all_writers()
    if orbax_ckptr is not None:
        orbax_ckptr.wait_until_finished()  # make the last async save durable
    if output_dir is not None and is_main_process:
        path = save_params(params, os.path.join(output_dir, checkpoint_name))
        logger.info("saved final model to %s", path)

    return {
        "epochs": num_epochs_run,
        "train_metrics": train_metrics,
        "val_metrics": val_metrics,
        "num_params": num_params(params),
        "params": params,
    }
