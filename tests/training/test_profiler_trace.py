"""Pin the profiler-trace seam of fit() (training.profiler_trace_dir).

The real jax.profiler cannot run meaningfully under pytest (and hangs on
tunneled TPU runtimes), so these tests monkeypatch the profiler entry
points and assert the fit loop's contract around them:

* start_trace/stop_trace bracket exactly epoch 1 (the first post-warmup
  epoch — epoch 0 pays one-off compiles) and fire exactly once;
* tunneled runtimes (JAX_PLATFORMS containing axon/proxy/pathways)
  self-disable with a warning and never call the profiler;
* a start_trace failure disables tracing for the rest of the run instead
  of crashing training, and stop_trace is never called unbalanced.

Reference analog: allRank exposes torch.autograd's detect_anomaly but has
no trace hook; this seam is TPU-specific (jax.profiler device traces).
"""

import jax
import numpy as np
import pytest

from allrank_tpu.config import FCConfig, ModelConfig, PostModelConfig
from allrank_tpu.data.batching import SlateBatcher
from allrank_tpu.data.dataset import SlateDataset
from allrank_tpu.data.dummy import generate_dummy_data
from allrank_tpu.losses import get_loss
from allrank_tpu.models.factory import init_params, make_model
from allrank_tpu.training import fit, make_optimizer


def _fit_kwargs(epochs=2, profiler_trace_dir=None):
    rng = np.random.RandomState(3)
    X, y, qid = generate_dummy_data(24, 8, 5, 8, rng)
    ds = SlateDataset(X.astype(np.float32), y.astype(np.float32), qid)
    mdef = make_model(
        ModelConfig(
            fc_model=FCConfig(sizes=[8], input_norm=False, activation="ReLU",
                              dropout=0.0),
            transformer=None,
            post_model=PostModelConfig(d_output=1),
        ),
        n_features=8,
    )
    loss_fn, needs_rng = get_loss("listNet")
    return dict(
        epochs=epochs,
        params=init_params(jax.random.PRNGKey(0), mdef),
        mdef=mdef,
        loss_fn=loss_fn,
        loss_kwargs={},
        needs_rng=needs_rng,
        optimizer=make_optimizer("Adam", {"lr": 1e-2}),
        scheduler=None,
        train_batcher=SlateBatcher(ds, 8, 8, shuffle=True, seed=1),
        val_batcher=SlateBatcher(ds, 8, 8, shuffle=False, seed=1),
        metrics={"ndcg": [5]},
        val_metric="ndcg_5",
        early_stopping_patience=0,
        gradient_clipping_norm=None,
        profiler_trace_dir=profiler_trace_dir,
    )


class _FakeProfiler:
    def __init__(self, fail_start=False):
        self.starts = []
        self.stops = 0
        self.fail_start = fail_start

    def start_trace(self, path):
        if self.fail_start:
            raise RuntimeError("injected profiler failure")
        self.starts.append(path)

    def stop_trace(self):
        self.stops += 1


def test_trace_brackets_epoch_one(monkeypatch, tmp_path):
    fake = _FakeProfiler()
    monkeypatch.setattr(jax.profiler, "start_trace", fake.start_trace)
    monkeypatch.setattr(jax.profiler, "stop_trace", fake.stop_trace)
    trace_dir = str(tmp_path / "trace")
    result = fit(**_fit_kwargs(epochs=3, profiler_trace_dir=trace_dir))
    assert result["epochs"] == 3
    assert fake.starts == [trace_dir]  # exactly once, the configured dir
    assert fake.stops == 1             # balanced — closed within epoch 1


def test_trace_needs_a_second_epoch(monkeypatch, tmp_path):
    """A 1-epoch run never reaches epoch 1: no trace, no unbalanced stop."""
    fake = _FakeProfiler()
    monkeypatch.setattr(jax.profiler, "start_trace", fake.start_trace)
    monkeypatch.setattr(jax.profiler, "stop_trace", fake.stop_trace)
    fit(**_fit_kwargs(epochs=1, profiler_trace_dir=str(tmp_path / "t")))
    assert fake.starts == [] and fake.stops == 0


@pytest.mark.parametrize("platform", ["axon", "cpu,proxy", "pathways"])
def test_tunneled_runtime_self_disables(monkeypatch, tmp_path, platform):
    """start_trace HANGS on tunneled runtimes — fit must never call it."""
    fake = _FakeProfiler()
    monkeypatch.setattr(jax.profiler, "start_trace", fake.start_trace)
    monkeypatch.setattr(jax.profiler, "stop_trace", fake.stop_trace)
    monkeypatch.setenv("JAX_PLATFORMS", platform)
    result = fit(**_fit_kwargs(epochs=2, profiler_trace_dir=str(tmp_path)))
    assert result["epochs"] == 2      # training unaffected
    assert fake.starts == [] and fake.stops == 0


def test_start_failure_degrades_without_crash(monkeypatch, tmp_path):
    fake = _FakeProfiler(fail_start=True)
    monkeypatch.setattr(jax.profiler, "start_trace", fake.start_trace)
    monkeypatch.setattr(jax.profiler, "stop_trace", fake.stop_trace)
    result = fit(**_fit_kwargs(epochs=3, profiler_trace_dir=str(tmp_path)))
    assert result["epochs"] == 3      # completed despite the injected failure
    assert fake.stops == 0            # disabled: no unbalanced stop_trace
