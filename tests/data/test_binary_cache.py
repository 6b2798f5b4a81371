"""Binary dataset cache (data.binary_cache): parse-once .npy sidecars with
memory-mapped X — bitwise equality, staleness invalidation, write-failure
degrade, and batcher-stream equivalence."""

import json
import os

import numpy as np
import pytest

import allrank_tpu.data.dataset as dataset_mod
from allrank_tpu.data.batching import SlateBatcher
from allrank_tpu.data.dataset import (
    SlateDataset,
    _cache_paths,
    parse_svmlight,
    parse_svmlight_cached,
)
from allrank_tpu.data.dummy import write_dummy_dataset


@pytest.fixture()
def data_file(tmp_path):
    d = str(tmp_path / "data")
    write_dummy_dataset(d, num_queries=24, results_len=9, num_features=7)
    return os.path.join(d, "train.txt")


def test_cache_roundtrip_bitwise_and_mmap(data_file, monkeypatch):
    ref = parse_svmlight(data_file)
    first = parse_svmlight_cached(data_file)
    for a, b in zip(first, ref):
        np.testing.assert_array_equal(a, b)
    meta_p, x_p, _, _ = _cache_paths(data_file)
    assert os.path.exists(meta_p) and os.path.exists(x_p)

    # second load must come from the cache (parser forbidden) with X mmap'd
    def boom(path):
        raise AssertionError("parser called despite a warm cache")

    monkeypatch.setattr(dataset_mod, "parse_svmlight", boom)
    x2, y2, q2 = parse_svmlight_cached(data_file)
    assert isinstance(x2, np.memmap)
    for a, b in zip((x2, y2, q2), ref):
        np.testing.assert_array_equal(a, b)


def test_first_parse_is_memmap_direct_when_native_available(data_file):
    """The FIRST parse (cache miss) fills X straight into the .npy sidecar
    via a writable memmap — the dense [N, F] never exists in host RAM —
    and returns a read-only mmap bitwise-equal to the in-RAM parse."""
    from allrank_tpu.data.native import _load

    if _load() is None:
        pytest.skip("native parser unavailable")
    ref = parse_svmlight(data_file)
    x, y, q = parse_svmlight_cached(data_file)  # miss -> direct path
    assert isinstance(x, np.memmap)
    assert not x.flags.writeable
    for a, b in zip((x, y, q), ref):
        np.testing.assert_array_equal(a, b)
    # the sidecar it mapped is the published cache file (no .tmp left)
    meta_p, x_p, _, _ = _cache_paths(data_file)
    assert os.path.exists(x_p) and os.path.exists(meta_p)
    assert not os.path.exists(x_p + ".tmp")
    # and the warm load maps the same bytes
    x2, _, _ = parse_svmlight_cached(data_file)
    np.testing.assert_array_equal(x2, ref[0])


def test_memmap_direct_fill_failure_cleans_up_tmp(data_file, monkeypatch):
    from allrank_tpu.data import native as native_mod

    def fail_after_alloc(path, x_alloc=None):
        if x_alloc is not None:
            x_alloc(4, 3)  # allocate the tmp sidecar, then "fail"
        return None

    monkeypatch.setattr(native_mod, "parse_svmlight_native", fail_after_alloc)
    got = parse_svmlight_cached(data_file)  # falls back to the in-RAM path
    ref = parse_svmlight(data_file)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)
    assert not os.path.exists(_cache_paths(data_file)[1] + ".tmp")


def test_read_only_contract_on_both_paths(data_file):
    x_miss, _, _ = parse_svmlight_cached(data_file)
    assert not x_miss.flags.writeable
    x_hit, _, _ = parse_svmlight_cached(data_file)
    assert not x_hit.flags.writeable
    with pytest.raises(ValueError):
        x_hit[0, 0] = 1.0


def test_cache_invalidates_when_source_changes(data_file):
    parse_svmlight_cached(data_file)
    with open(data_file, "a") as f:
        f.write("3 qid:999999 1:0.5 7:1.25\n")
    x, y, q = parse_svmlight_cached(data_file)  # must re-parse, not hit
    ref = parse_svmlight(data_file)
    np.testing.assert_array_equal(x, ref[0])
    assert q[-1] == 999999
    # and the refreshed cache is itself a valid hit
    x3, _, _ = parse_svmlight_cached(data_file)
    np.testing.assert_array_equal(x3, ref[0])


def test_cache_write_failure_degrades_to_plain_parse(data_file, monkeypatch):
    def no_save(*a, **k):
        raise OSError("read-only filesystem")

    monkeypatch.setattr(dataset_mod.np, "save", no_save)
    got = parse_svmlight_cached(data_file)
    ref = parse_svmlight(data_file)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)
    assert not os.path.exists(_cache_paths(data_file)[0])


def test_corrupt_meta_is_a_miss_not_a_crash(data_file):
    parse_svmlight_cached(data_file)
    meta_p = _cache_paths(data_file)[0]
    with open(meta_p, "w") as f:
        f.write("{not json")
    got = parse_svmlight_cached(data_file)
    for a, b in zip(got, parse_svmlight(data_file)):
        np.testing.assert_array_equal(a, b)
    assert json.load(open(meta_p))  # rewritten valid


def test_batcher_stream_identical_through_cached_mmap_dataset(data_file):
    ds_plain = SlateDataset.from_svm_file(data_file)
    parse_svmlight_cached(data_file)  # warm
    ds_cached = SlateDataset.from_svm_file(data_file, binary_cache=True)

    # X must stay mmap-backed through SlateDataset (views, no dense copy)
    def mmap_backed(a):
        while isinstance(a, np.ndarray):
            if isinstance(a, np.memmap):
                return True
            a = a.base
        return False

    assert mmap_backed(ds_cached._flat_X)
    assert mmap_backed(ds_cached.X_by_qid[0])

    for a, b in zip(
        SlateBatcher(ds_plain, 9, 8, shuffle=True, seed=3),
        SlateBatcher(ds_cached, 9, 8, shuffle=True, seed=3),
    ):
        np.testing.assert_array_equal(a.x, b.x)
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.indices, b.indices)
        np.testing.assert_array_equal(a.slate_mask, b.slate_mask)
