"""Device feature store: index-mode batching + on-device gather must be
bit-identical to the materializing host path (same slate-fixing rng
streams; only the row payload moves device-side)."""

import numpy as np
import pytest

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.data import SlateDataset
from allrank_tpu.data.batching import BucketedSlateBatcher, SlateBatcher
from allrank_tpu.data.feature_store import DeviceFeatureStore


def _dataset(n_queries=11, seed=0, max_len=9, n_features=4):
    """Ragged slates spanning shorter and longer than any fixed length."""
    rng = np.random.RandomState(seed)
    lengths = rng.randint(2, max_len + 1, size=n_queries)
    X = rng.randn(int(lengths.sum()), n_features).astype(np.float32)
    y = rng.randint(0, 3, size=int(lengths.sum())).astype(np.float32)
    qids = np.repeat(np.arange(n_queries), lengths)
    return SlateDataset(X, y, qids)


def _host_table(ds):
    flat_X, _, _, _ = ds.flat_slate_buffers()
    return np.concatenate(
        [flat_X, np.zeros((1, flat_X.shape[1]), flat_X.dtype)], axis=0
    )


def _assert_batches_equal(normal_iter, index_iter, table):
    n = 0
    for nb, ib in zip(normal_iter, index_iter):
        np.testing.assert_array_equal(table[ib.x], nb.x)
        np.testing.assert_array_equal(ib.y, nb.y)
        np.testing.assert_array_equal(ib.indices, nb.indices)
        np.testing.assert_array_equal(ib.slate_mask, nb.slate_mask)
        assert ib.x.dtype == np.int32
        n += 1
    assert n == len(list(normal_iter)) or n > 0
    return n


@pytest.mark.parametrize("slate_length", [5, 12])
def test_index_mode_matches_materialized(slate_length):
    ds = _dataset()
    table = _host_table(ds)
    kw = dict(slate_length=slate_length, batch_size=4, shuffle=True, seed=3)
    for epoch in (0, 1):  # rng streams must stay in lockstep across epochs
        a = SlateBatcher(ds, **kw)
        b = SlateBatcher(ds, emit_row_indices=True, **kw)
        a.set_epoch(epoch)
        b.set_epoch(epoch)
        assert _assert_batches_equal(iter(a), iter(b), table) == len(a)


def test_index_mode_pads_point_at_sentinel():
    ds = _dataset()
    table = _host_table(ds)
    sentinel = table.shape[0] - 1
    batcher = SlateBatcher(ds, slate_length=12, batch_size=4,
                           emit_row_indices=True)
    for batch in batcher:
        pads = batch.y == PADDED_Y_VALUE
        assert (batch.x[pads] == sentinel).all()
        np.testing.assert_array_equal(table[batch.x][pads], 0.0)
        # dummy trailing slates are all-sentinel
        assert (batch.x[~batch.slate_mask] == sentinel).all()


def test_bucketed_index_mode_matches():
    ds = _dataset(n_queries=17, seed=5, max_len=20)
    table = _host_table(ds)
    a = BucketedSlateBatcher(ds, batch_size=4, n_buckets=3)
    b = BucketedSlateBatcher(ds, batch_size=4, n_buckets=3,
                             emit_row_indices=True)
    assert _assert_batches_equal(iter(a), iter(b), table) == len(a)


def test_index_mode_requires_flat_buffers():
    class NoFlat:
        def __len__(self):
            return 1

    batcher = SlateBatcher(NoFlat(), slate_length=4, batch_size=2,
                           emit_row_indices=True)
    with pytest.raises(ValueError, match="flat slate buffers"):
        next(iter(batcher))


def test_fit_with_feature_store_matches_direct():
    """Two-epoch training through the device-cache path produces exactly the
    metrics/loss of the materializing path (CPU, fp32, same seeds)."""
    import jax

    from allrank_tpu.config import (FCConfig, ModelConfig, PostModelConfig,
                                    TransformerConfig)
    from allrank_tpu.losses import get_loss
    from allrank_tpu.models.factory import init_params, make_model
    from allrank_tpu.training import make_optimizer
    from allrank_tpu.training.train_utils import fit

    ds = _dataset(n_queries=13, seed=7, max_len=8, n_features=5)
    mdef = make_model(ModelConfig(
        fc_model=FCConfig(sizes=[8], input_norm=False, activation="ReLU",
                          dropout=0.0),
        transformer=TransformerConfig(N=1, d_ff=16, h=1,
                                      positional_encoding=None, dropout=0.0),
        post_model=PostModelConfig(d_output=1, output_activation=None)), 5)

    def run(device_cache):
        params = init_params(jax.random.PRNGKey(0), mdef)
        kw = dict(slate_length=6, batch_size=4, seed=2,
                  emit_row_indices=device_cache)
        table = DeviceFeatureStore(ds).table if device_cache else None
        loss_fn, needs_rng = get_loss("listNet")
        return fit(
            epochs=2, params=params, mdef=mdef, loss_fn=loss_fn,
            loss_kwargs={}, needs_rng=needs_rng,
            optimizer=make_optimizer("Adam", {"lr": 1e-2}), scheduler=None,
            train_batcher=SlateBatcher(ds, shuffle=True, **kw),
            val_batcher=SlateBatcher(ds, shuffle=False, **kw),
            metrics={"ndcg": [5]}, val_metric="ndcg_5",
            early_stopping_patience=0, gradient_clipping_norm=None,
            output_dir=None, train_feature_table=table,
            val_feature_table=table,
        )

    direct = run(False)
    cached = run(True)
    assert cached["val_metrics"] == direct["val_metrics"]
    assert cached["train_metrics"] == direct["train_metrics"]


def test_bf16_store_bit_identical_under_bf16_compute():
    """A bf16 feature table composed with the step's own bf16 cast is
    bit-identical to gathering fp32 and casting (rounding commutes with
    gather), while the table is half the bytes."""
    import jax
    import jax.numpy as jnp

    from allrank_tpu.data.feature_store import resolve_store_dtype

    ds = _dataset(n_queries=9, seed=11, max_len=7, n_features=6)
    f32 = DeviceFeatureStore(ds)
    bf16 = DeviceFeatureStore(ds, dtype="bfloat16")
    assert bf16.table.dtype == jnp.bfloat16
    assert bf16.table.nbytes * 2 == f32.table.nbytes
    assert bf16.sentinel == f32.sentinel

    idx = np.array([[0, 3, 5, bf16.sentinel], [2, 2, 1, 4]], dtype=np.int32)

    @jax.jit
    def gather_cast(table, idx):
        return jnp.take(table, idx, axis=0).astype(jnp.bfloat16)

    np.testing.assert_array_equal(
        np.asarray(gather_cast(f32.table, idx), dtype=np.float32),
        np.asarray(gather_cast(bf16.table, idx), dtype=np.float32),
    )

    # knob resolution: auto follows compute dtype; explicit passes through
    assert resolve_store_dtype("auto", "bfloat16") == "bfloat16"
    assert resolve_store_dtype("auto", "float32") is None
    assert resolve_store_dtype("float32", "bfloat16") == "float32"
    assert resolve_store_dtype("bfloat16", "float32") == "bfloat16"
