"""Sharded device feature store: the row-sharded HBM table + collective
gather must be BITWISE identical to the replicated store on a multi-device
mesh, while the per-device table footprint drops by the data-axis size.

This is the option that removes the replicated table's per-chip HBM ceiling
(an Istella-X-scale corpus >= 10 GB can't replicate): each chip holds
1/data_size of the [n_docs, F] matrix, and the step's gather becomes
all-gather(int32 indices) + owner-masked local gather + psum_scatter(rows).
No reference analog — the reference re-ships every batch host->device
(allrank/data/dataset_loading.py:230-247).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from allrank_tpu.config import ParallelConfig
from allrank_tpu.data.feature_store import DeviceFeatureStore, make_table_gather
from allrank_tpu.parallel import make_mesh

from tests.data.test_feature_store import _dataset


def _require_devices(n: int):
    if jax.device_count() < n:
        pytest.skip(f"needs {n} devices, have {jax.device_count()}")


@pytest.mark.parametrize("parallel", [
    ParallelConfig(data=8),
    ParallelConfig(data=4, model=2),
    ParallelConfig(data=2, model=2, sequence=2),
])
def test_sharded_gather_bitwise_matches_replicated(parallel):
    _require_devices(8)
    mesh = make_mesh(parallel)
    # n_docs deliberately NOT divisible by the data size -> exercises row
    # padding; sentinel index included in the batch -> padded slots
    ds = _dataset(n_queries=13, seed=3, max_len=9, n_features=5)
    rep = DeviceFeatureStore(ds, mesh, sharding="replicated")
    shd = DeviceFeatureStore(ds, mesh, sharding="sharded")
    data_size = mesh.shape["data"]

    assert shd.sharding == "sharded"
    assert shd.sentinel == rep.sentinel
    assert shd.table.shape[0] % data_size == 0
    # the table is genuinely row-sharded: each device holds 1/data_size rows
    shard_rows = {s.data.shape[0] for s in shd.table.addressable_shards}
    assert shard_rows == {shd.table.shape[0] // data_size}
    rep_rows = {s.data.shape[0] for s in rep.table.addressable_shards}
    assert rep_rows == {rep.table.shape[0]}

    rng = np.random.RandomState(0)
    B, L = 16, 7
    idx = rng.randint(0, shd.sentinel + 1, size=(B, L)).astype(np.int32)
    idx[0, :3] = shd.sentinel  # padded slots -> zero rows
    idx[1, 0] = 0
    idx[2, 1] = shd.sentinel - 1  # last real row (owned by the last shard)

    from jax.sharding import NamedSharding, PartitionSpec as P

    idx_sharded = jax.device_put(idx, NamedSharding(mesh, P("data")))
    want = np.asarray(jax.jit(rep.gather)(rep.table, idx_sharded))
    got = np.asarray(jax.jit(shd.gather)(shd.table, idx_sharded))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got[0, :3], 0.0)


def test_sharded_gather_bf16_table():
    _require_devices(8)
    mesh = make_mesh(ParallelConfig(data=8))
    ds = _dataset(n_queries=11, seed=5, max_len=8, n_features=6)
    rep = DeviceFeatureStore(ds, mesh, dtype="bfloat16")
    shd = DeviceFeatureStore(ds, mesh, dtype="bfloat16", sharding="sharded")
    assert shd.table.dtype == jnp.bfloat16

    idx = np.random.RandomState(1).randint(
        0, shd.sentinel + 1, size=(8, 5)).astype(np.int32)
    from jax.sharding import NamedSharding, PartitionSpec as P

    idx = jax.device_put(idx, NamedSharding(mesh, P("data")))
    np.testing.assert_array_equal(
        np.asarray(jax.jit(shd.gather)(shd.table, idx), dtype=np.float32),
        np.asarray(jax.jit(rep.gather)(rep.table, idx), dtype=np.float32),
    )


def test_single_data_shard_falls_back_to_replicated():
    """data=1 meshes (and no mesh at all) keep the local-take path — the
    sharded option costs nothing when there is nothing to shard over."""
    _require_devices(2)
    mesh = make_mesh(ParallelConfig(data=1, model=2))
    ds = _dataset(n_queries=5, seed=9, max_len=6, n_features=3)
    store = DeviceFeatureStore(ds, mesh, sharding="sharded")
    assert store.sharding == "replicated"

    no_mesh = DeviceFeatureStore(ds, sharding="sharded")
    assert no_mesh.sharding == "replicated"


def test_invalid_sharding_rejected():
    ds = _dataset(n_queries=3, seed=0, max_len=5, n_features=3)
    with pytest.raises(ValueError, match="device_cache_sharding"):
        DeviceFeatureStore(ds, sharding="row")


def test_fit_with_sharded_store_bitwise_matches_replicated():
    """Two training epochs + eval through the full fit loop on an 8-device
    (data=4, model=2) mesh: metrics and final params from the sharded store
    equal the replicated store's exactly."""
    _require_devices(8)
    from allrank_tpu.config import (FCConfig, ModelConfig, PostModelConfig,
                                    TransformerConfig)
    from allrank_tpu.data.batching import SlateBatcher
    from allrank_tpu.losses import get_loss
    from allrank_tpu.models.factory import init_params, make_model
    from allrank_tpu.parallel import batch_shardings
    from allrank_tpu.training import make_optimizer
    from allrank_tpu.training.train_utils import fit

    mesh = make_mesh(ParallelConfig(data=4, model=2))
    ds = _dataset(n_queries=37, seed=7, max_len=8, n_features=5)
    mdef = make_model(ModelConfig(
        fc_model=FCConfig(sizes=[8], input_norm=False, activation="ReLU",
                          dropout=0.0),
        transformer=TransformerConfig(N=1, d_ff=16, h=2,
                                      positional_encoding=None, dropout=0.0),
        post_model=PostModelConfig(d_output=1, output_activation=None)), 5)

    def run(sharding):
        params = init_params(jax.random.PRNGKey(0), mdef)
        store = DeviceFeatureStore(ds, mesh, sharding=sharding)
        kw = dict(slate_length=6, batch_size=8, seed=2, emit_row_indices=True)
        loss_fn, needs_rng = get_loss("listNet")
        with mesh:
            result = fit(
                epochs=2, params=params, mdef=mdef, loss_fn=loss_fn,
                loss_kwargs={}, needs_rng=needs_rng,
                optimizer=make_optimizer("Adam", {"lr": 1e-2}), scheduler=None,
                train_batcher=SlateBatcher(ds, shuffle=True, **kw),
                val_batcher=SlateBatcher(ds, shuffle=False, **kw),
                metrics={"ndcg": [5]}, val_metric="ndcg_5",
                early_stopping_patience=0, gradient_clipping_norm=None,
                output_dir=None, batch_shardings=batch_shardings(mesh),
                train_feature_table=store.table, val_feature_table=store.table,
                table_gather=store.gather,
            )
        return result

    rep = run("replicated")
    shd = run("sharded")
    assert shd["val_metrics"] == rep["val_metrics"]
    assert shd["train_metrics"] == rep["train_metrics"]
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(rep["params"]),
        jax.tree_util.tree_leaves_with_path(shd["params"]),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gather_fn_without_mesh_is_plain_take():
    gather = make_table_gather(None, "sharded")
    table = jnp.arange(12.0).reshape(4, 3)
    idx = jnp.array([[0, 3], [2, 1]], dtype=jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(gather(table, idx)),
        np.asarray(jnp.take(table, idx, axis=0)),
    )
