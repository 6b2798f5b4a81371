"""Data pipeline tests: svm parsing, qid grouping, slate fixing, batching,
round-trip saving."""

import numpy as np
import pytest

from allrank_tpu.constants import PADDED_INDEX_VALUE, PADDED_Y_VALUE
from allrank_tpu.data import (
    SlateBatcher,
    SlateDataset,
    generate_dummy_data,
    load_dataset_role,
    write_dummy_dataset,
    write_to_libsvm_without_masked,
)
from allrank_tpu.data.slate_fixing import fix_slate, pad_slate, sample_slate


@pytest.fixture(scope="module")
def dummy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dummy")
    return write_dummy_dataset(str(d), num_queries=10, results_len=7,
                               num_labels=3, num_features=5)


class TestDataset:
    def test_groups_by_qid_first_appearance(self):
        X = np.arange(12, dtype=np.float32).reshape(6, 2)
        y = np.arange(6, dtype=np.float32)
        qids = np.array([7, 7, 3, 3, 3, 9])
        ds = SlateDataset(X, y, qids)
        assert len(ds) == 3
        np.testing.assert_array_equal(ds.y_by_qid[0], [0, 1])
        np.testing.assert_array_equal(ds.y_by_qid[1], [2, 3, 4])
        np.testing.assert_array_equal(ds.y_by_qid[2], [5])
        assert ds.longest_query_length == 3
        assert ds.shape == [3, 3, 2]

    def test_load_from_file(self, dummy_dir):
        ds, eff = load_dataset_role("train", dummy_dir, slate_length=4)
        assert len(ds) == 10
        assert ds.n_features == 5
        assert eff == 4

    def test_val_role_pads_to_longest(self, dummy_dir):
        ds, eff = load_dataset_role("vali", dummy_dir, slate_length=4)
        assert eff == ds.longest_query_length == 7


class TestSlateFixing:
    def test_pad_short_slate(self):
        x = np.ones((2, 3), dtype=np.float32)
        y = np.array([1.0, 2.0], dtype=np.float32)
        fx, fy, fi = pad_slate(x, y, 4)
        assert fx.shape == (4, 3)
        np.testing.assert_array_equal(fy, [1, 2, PADDED_Y_VALUE, PADDED_Y_VALUE])
        np.testing.assert_array_equal(fi, [0, 1, PADDED_INDEX_VALUE, PADDED_INDEX_VALUE])
        np.testing.assert_array_equal(fx[2:], 0.0)

    def test_sample_long_slate_keeps_relevant(self):
        rng = np.random.RandomState(0)
        x = np.arange(20, dtype=np.float32).reshape(10, 2)
        y = np.zeros(10, dtype=np.float32)
        y[7] = 1.0  # single relevant doc
        for _ in range(20):
            fx, fy, fi = sample_slate(x, y, 3, rng)
            assert fy.sum() >= 1.0  # the guard must always retain the relevant doc
            assert fx.shape == (3, 2)

    def test_sample_all_zero_ok(self):
        rng = np.random.RandomState(0)
        x = np.zeros((5, 2), dtype=np.float32)
        y = np.zeros(5, dtype=np.float32)
        fx, fy, fi = fix_slate(x, y, 3, rng)
        assert fy.sum() == 0.0

    def test_sample_indices_are_original_positions(self):
        rng = np.random.RandomState(1)
        x = np.arange(10, dtype=np.float32).reshape(5, 2)
        y = np.arange(5, dtype=np.float32)
        fx, fy, fi = sample_slate(x, y, 3, rng)
        np.testing.assert_array_equal(y[fi], fy)
        np.testing.assert_array_equal(x[fi], fx)


class TestBatcher:
    def test_fixed_shapes_with_partial_batch(self, dummy_dir):
        ds, _ = load_dataset_role("train", dummy_dir, slate_length=4)
        batcher = SlateBatcher(ds, slate_length=4, batch_size=4, shuffle=False)
        batches = list(batcher)
        assert len(batches) == 3  # 10 slates / 4
        for b in batches:
            assert b.x.shape == (4, 4, 5)
            assert b.y.shape == (4, 4)
            assert b.indices.shape == (4, 4)
        assert batches[-1].slate_mask.sum() == 2  # 10 = 4+4+2
        # dummy slates are fully padded
        assert (batches[-1].y[2:] == PADDED_Y_VALUE).all()

    def test_shuffle_changes_with_epoch_and_is_seeded(self, dummy_dir):
        ds, _ = load_dataset_role("train", dummy_dir, slate_length=7)
        b1 = SlateBatcher(ds, 7, 4, shuffle=True, seed=1)
        b2 = SlateBatcher(ds, 7, 4, shuffle=True, seed=1)
        e0_a = next(iter(b1)).y
        e0_b = next(iter(b2)).y
        np.testing.assert_array_equal(e0_a, e0_b)
        b1.set_epoch(1)
        e1 = next(iter(b1)).y
        assert not np.array_equal(e0_a, e1)

    def _identifiable_dataset(self, n_slates=11, docs=7, n_features=3):
        """Each slate's feature 0 equals its slate id — slates are
        identifiable after shuffling/subsampling."""
        X = np.zeros((n_slates * docs, n_features), dtype=np.float32)
        X[:, 0] = np.repeat(np.arange(n_slates, dtype=np.float32), docs)
        y = np.tile(np.arange(docs, dtype=np.float32) % 3, n_slates)
        qids = np.repeat(np.arange(n_slates), docs)
        return SlateDataset(X, y, qids)

    def test_multiprocess_epoch_covers_every_slate_exactly_once(self):
        """Across P simulated processes, each epoch consumes every dataset
        slate exactly once (the reference's DataParallel global-batch
        convention, dataset_loading.py:239-242, without silent data loss)."""
        ds = self._identifiable_dataset()
        G = 4
        for P in (2, 4):
            rows_per = G // P
            seen = []
            for p in range(P):
                lr = np.arange(p * rows_per, (p + 1) * rows_per)
                batcher = SlateBatcher(ds, 5, G, shuffle=True, seed=3,
                                       local_rows=lr)
                batcher.set_epoch(2)
                for b in batcher:
                    seen.extend(b.x[b.slate_mask, 0, 0].astype(int).tolist())
            assert sorted(seen) == list(range(len(ds)))

    def test_multiprocess_assembly_is_layout_invariant(self):
        """Concatenating the P per-process shards reproduces the P=1 global
        batch bit-for-bit (subsampling rng is per-slate, not per-process)."""
        ds = self._identifiable_dataset()  # 7-doc slates, L=5 -> subsample path
        G = 4
        ref = list(SlateBatcher(ds, 5, G, shuffle=True, seed=3))
        for P in (2, 4):
            rows_per = G // P
            shards = [
                list(SlateBatcher(ds, 5, G, shuffle=True, seed=3,
                                  local_rows=np.arange(p * rows_per,
                                                       (p + 1) * rows_per)))
                for p in range(P)
            ]
            assert all(len(s) == len(ref) for s in shards)
            for t, rb in enumerate(ref):
                for leaf_i in range(4):
                    glob = np.concatenate([shards[p][t][leaf_i] for p in range(P)])
                    np.testing.assert_array_equal(glob, rb[leaf_i])

    def test_num_workers_matches_serial_assembly(self):
        ds = self._identifiable_dataset()
        serial = list(SlateBatcher(ds, 5, 4, shuffle=True, seed=3))
        pooled = list(SlateBatcher(ds, 5, 4, shuffle=True, seed=3,
                                   num_workers=4))
        for sb, pb in zip(serial, pooled):
            for leaf_i in range(4):
                np.testing.assert_array_equal(sb[leaf_i], pb[leaf_i])

    def test_full_length_slates_are_permuted_each_epoch(self):
        """Reference FixLength sends n == L slates through _sample (a fresh
        permutation per epoch, dataset_loading.py:55-58) — not identity."""
        ds = self._identifiable_dataset(n_slates=2, docs=7)
        batcher = SlateBatcher(ds, 7, 2, shuffle=False, seed=0)
        b0 = next(iter(batcher))
        batcher.set_epoch(1)
        b1 = next(iter(batcher))
        assert not np.array_equal(b0.indices, b1.indices)
        # permutation, not subsample: all 7 original ranks present
        assert sorted(b0.indices[0].tolist()) == list(range(7))

    def test_process_local_rows_single_process_owns_all(self):
        from allrank_tpu.parallel import make_mesh, process_local_rows

        mesh = make_mesh()
        rows = process_local_rows(16, mesh)
        np.testing.assert_array_equal(rows, np.arange(16))


class TestSaving:
    def test_round_trip_strips_padding(self, tmp_path):
        X = [np.array([[1.0, 0.0], [0.0, 2.0], [0.0, 0.0]]),
             np.array([[3.0, 1.0], [0.0, 0.0], [0.0, 0.0]])]
        y = [np.array([1.0, 0.0, PADDED_Y_VALUE]),
             np.array([2.0, PADDED_Y_VALUE, PADDED_Y_VALUE])]
        path = str(tmp_path / "out.txt")
        write_to_libsvm_without_masked(path, X, y)
        ds = SlateDataset.from_svm_file(path)
        assert len(ds) == 2
        np.testing.assert_array_equal(ds.y_by_qid[0], [1.0, 0.0])
        np.testing.assert_array_equal(ds.y_by_qid[1], [2.0])


class TestDummyData:
    def test_label_formula(self):
        rng = np.random.RandomState(42)
        X, y, qid = generate_dummy_data(5, 4, 3, 6, rng)
        assert X.shape == (20, 6)
        expected = np.maximum(0, (((X + 1) / 2).mean(axis=-1) * 3).astype(np.int32))
        np.testing.assert_array_equal(y, expected)
        assert (np.bincount(qid) == 4).all()


class TestBucketedBatcher:
    def _heterogeneous_dataset(self, seed=0):
        """Slates of widely varying lengths (3..40 docs)."""
        rng = np.random.RandomState(seed)
        Xs, ys, qids = [], [], []
        for q in range(30):
            n = int(rng.randint(3, 41))
            Xs.append(rng.randn(n, 6).astype(np.float32))
            ys.append(rng.randint(0, 3, n).astype(np.float32))
            qids.extend([q] * n)
        return SlateDataset(np.concatenate(Xs), np.concatenate(ys),
                            np.array(qids))

    def test_buckets_cover_dataset_once_with_smaller_shapes(self):
        from allrank_tpu.data.batching import BucketedSlateBatcher

        ds = self._heterogeneous_dataset()
        bb = BucketedSlateBatcher(ds, batch_size=8, n_buckets=4)
        lengths = sorted(length for length, _ in bb.buckets)
        assert lengths[-1] >= ds.longest_query_length  # top bucket fits all
        assert lengths[0] < ds.longest_query_length  # smaller shapes exist
        n_seen = sum(int(b.slate_mask.sum()) for b in bb)
        assert n_seen == len(ds)

    def test_bucketed_metrics_match_pad_to_longest(self):
        """Bucketing is metric-invariant (the padding-invariance property of
        every metric, reference semantics: dataset_loading.py:185-194)."""
        import jax

        from allrank_tpu.config import FCConfig, ModelConfig, PostModelConfig
        from allrank_tpu.data.batching import BucketedSlateBatcher
        from allrank_tpu.losses import get_loss
        from allrank_tpu.models.factory import init_params, make_model
        from allrank_tpu.training.train_utils import (
            compute_metrics,
            make_eval_fns,
        )

        ds = self._heterogeneous_dataset()
        mdef = make_model(
            ModelConfig(
                fc_model=FCConfig(sizes=[8], input_norm=False,
                                  activation="ReLU", dropout=0.0),
                transformer=None,
                post_model=PostModelConfig(d_output=1),
            ),
            n_features=6,
        )
        params = init_params(jax.random.PRNGKey(0), mdef)
        loss_fn, needs_rng = get_loss("listNet")
        eval_step = make_eval_fns(mdef, loss_fn, {}, needs_rng,
                                  {"ndcg": [5, 10]})
        rng = jax.random.PRNGKey(1)

        flat = SlateBatcher(ds, ds.longest_query_length, 8, shuffle=False)
        bucketed = BucketedSlateBatcher(ds, batch_size=8, n_buckets=4)
        m_flat, _ = compute_metrics(eval_step, params, flat, rng)
        m_bucket, _ = compute_metrics(eval_step, params, bucketed, rng)
        for k in m_flat:
            assert abs(m_flat[k] - m_bucket[k]) < 1e-5, (k, m_flat, m_bucket)

    def test_bucketed_multiprocess_rows_cover_dataset_once(self):
        """Bucketed eval preserves the multi-host local-rows contract."""
        from allrank_tpu.data.batching import BucketedSlateBatcher

        ds = self._heterogeneous_dataset()
        G, P = 8, 4
        rows_per = G // P
        seen = 0
        ref = list(BucketedSlateBatcher(ds, batch_size=G, n_buckets=3))
        for p in range(P):
            lr = np.arange(p * rows_per, (p + 1) * rows_per)
            bb = BucketedSlateBatcher(ds, batch_size=G, n_buckets=3,
                                      local_rows=lr)
            assert len(bb) == len(ref)
            seen += sum(int(b.slate_mask.sum()) for b in bb)
        assert seen == len(ds)


class TestNativeAssembler:
    def _lib(self):
        from allrank_tpu.data.native import _load_assembler

        lib = _load_assembler()
        if lib is None:
            pytest.skip("slate_assembler.so not built")
        return lib

    def test_relevance_guard_holds(self):
        """Subsampled slates with >=1 relevant doc keep >=1 after sampling
        (reference guard: dataset_loading.py:61-79) — native path."""
        self._lib()
        n_slates, docs = 40, 30
        X = np.random.RandomState(0).randn(n_slates * docs, 4).astype(np.float32)
        y = np.zeros(n_slates * docs, dtype=np.float32)
        y[::docs] = 1.0  # exactly one relevant doc per slate
        qids = np.repeat(np.arange(n_slates), docs)
        ds = SlateDataset(X, y, qids)
        for epoch in range(5):
            b = SlateBatcher(ds, 5, n_slates, shuffle=False, seed=epoch)
            b.set_epoch(epoch)
            batch = next(iter(b))
            per_slate = (batch.y == 1.0).sum(axis=1)
            assert (per_slate >= 1).all()

    def test_native_matches_python_fallback_structure(self):
        """Native and Python paths agree on everything non-random: padded
        slates bitwise, sampled slates as (index, y, x) consistent draws."""
        import os

        self._lib()
        rng = np.random.RandomState(1)
        docs = [3, 10, 7, 5]  # L=7: pad, subsample, permute, pad
        X = rng.randn(sum(docs), 3).astype(np.float32)
        y = rng.randint(0, 3, sum(docs)).astype(np.float32)
        qids = np.repeat(np.arange(len(docs)), docs)
        ds = SlateDataset(X, y, qids)

        native_b = next(iter(SlateBatcher(ds, 7, 4, shuffle=False, seed=9)))
        os.environ["ALLRANK_TPU_NO_NATIVE_ASSEMBLY"] = "1"
        try:
            import allrank_tpu.data.native as native_mod

            native_mod._ASM_TRIED = False
            py_b = next(iter(SlateBatcher(ds, 7, 4, shuffle=False, seed=9)))
        finally:
            del os.environ["ALLRANK_TPU_NO_NATIVE_ASSEMBLY"]
            native_mod._ASM_TRIED = False

        # padded slates (0 and 3) are deterministic -> bitwise equal
        for row in (0, 3):
            np.testing.assert_array_equal(native_b.x[row], py_b.x[row])
            np.testing.assert_array_equal(native_b.y[row], py_b.y[row])
            np.testing.assert_array_equal(native_b.indices[row], py_b.indices[row])
        # sampled slates: draws differ (different RNGs) but must be
        # self-consistent: y/x equal the gather of the original by indices
        for b in (native_b, py_b):
            for row in (1, 2):
                idx = b.indices[row]
                sx, sy = ds[row]
                np.testing.assert_array_equal(b.y[row], sy[idx])
                np.testing.assert_array_equal(b.x[row], sx[idx])
        # permute slate (row 2, n == L): all original ranks present
        assert sorted(native_b.indices[2].tolist()) == list(range(7))

    @pytest.mark.parametrize("seed", range(8))
    def test_native_python_fuzz_parity(self, seed):
        """Seeded shape fuzz of the two assembly paths: random slate-length
        mixes (pad / exact / subsample, incl. 1-doc slates). Deterministic
        slates (n <= L) must be BITWISE equal across paths; subsampled
        slates must satisfy the provenance + relevance-guard invariants on
        both paths."""
        import os

        self._lib()
        rng = np.random.RandomState(1000 + seed)
        n_slates = rng.randint(2, 12)
        L = rng.randint(1, 9)
        docs = [int(rng.randint(1, 2 * L + 2)) for _ in range(n_slates)]
        F = rng.randint(1, 6)
        X = rng.randn(sum(docs), F).astype(np.float32)
        y = rng.randint(0, 3, sum(docs)).astype(np.float32)
        qids = np.repeat(np.arange(n_slates), docs)
        ds = SlateDataset(X, y, qids)

        def collect():
            b = SlateBatcher(ds, L, n_slates, shuffle=False, seed=seed)
            b.set_epoch(0)
            return next(iter(b))

        native_b = collect()
        os.environ["ALLRANK_TPU_NO_NATIVE_ASSEMBLY"] = "1"
        try:
            import allrank_tpu.data.native as native_mod

            native_mod._ASM_TRIED = False
            py_b = collect()
        finally:
            del os.environ["ALLRANK_TPU_NO_NATIVE_ASSEMBLY"]
            native_mod._ASM_TRIED = False

        for row in range(n_slates):
            n = docs[row]
            sx, sy = ds[row]
            if n < L:  # deterministic: pad in source order (n >= L slates
                # draw a permutation/subsample -> RNGs differ across paths)
                np.testing.assert_array_equal(native_b.x[row], py_b.x[row])
                np.testing.assert_array_equal(native_b.y[row], py_b.y[row])
                np.testing.assert_array_equal(native_b.indices[row],
                                              py_b.indices[row])
            for b in (native_b, py_b):
                idx = b.indices[row]
                real = idx >= 0
                assert real.sum() == min(n, L)
                np.testing.assert_array_equal(b.y[row][real], sy[idx[real]])
                np.testing.assert_array_equal(b.x[row][real], sx[idx[real]])
                # subsample keeps >=1 relevant doc when the source had one
                if n > L and (sy > 0).any():
                    assert (b.y[row][real] > 0).any()
