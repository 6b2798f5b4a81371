"""Dataset validator CLI + the non-contiguous-qid regrouping guard."""

import os

import numpy as np

from allrank_tpu.data.dataset import SlateDataset
from allrank_tpu.data.dummy import write_dummy_dataset
from allrank_tpu.data.validate import run as validate_run


def test_clean_dataset_validates_ok(tmp_path):
    d = str(tmp_path / "data")
    write_dummy_dataset(d, num_queries=12, results_len=6, num_features=5)
    assert validate_run(d, ["train", "vali"], slate_length=6) == 0


def test_errors_on_nan_and_dim_mismatch(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    (d / "train.txt").write_text("1 qid:1 1:0.5 2:nan\n0 qid:1 1:0.25\n")
    (d / "vali.txt").write_text("1 qid:9 1:0.5 2:1.0 3:2.0\n")
    assert validate_run(str(d), ["train", "vali"]) == 1


def test_warnings_strict_gate(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    # non-contiguous qids + a single-doc slate + non-integer label
    (d / "train.txt").write_text(
        "1 qid:1 1:0.5\n0.5 qid:2 1:0.25\n2 qid:1 1:0.75\n")
    assert validate_run(str(d), ["train"]) == 0  # warnings only
    assert validate_run(str(d), ["train"], strict=True) == 1


def test_missing_role_is_an_error(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    assert validate_run(str(d), ["train"]) == 1


def test_noncontiguous_qids_regroup_correctly():
    X = np.arange(10, dtype=np.float32).reshape(5, 2)
    y = np.arange(5, dtype=np.float32)
    ds = SlateDataset(X, y, np.array([7, 8, 7, 8, 7]))
    assert len(ds) == 2
    np.testing.assert_array_equal(ds[0][1], [0.0, 2.0, 4.0])
    np.testing.assert_array_equal(ds[1][1], [1.0, 3.0])
    np.testing.assert_array_equal(ds[0][0], X[[0, 2, 4]])
    np.testing.assert_array_equal(ds[1][0], X[[1, 3]])
    # flat buffers must be regrouped too (the native assembler reads them)
    fx, fy, offsets, _ = ds.flat_slate_buffers()
    np.testing.assert_array_equal(fy, [0.0, 2.0, 4.0, 1.0, 3.0])
    np.testing.assert_array_equal(offsets, [0, 3, 5])


def test_contiguous_path_unchanged(tmp_path):
    d = str(tmp_path / "data")
    write_dummy_dataset(d, num_queries=8, results_len=5, num_features=4)
    from allrank_tpu.data.dataset import parse_svmlight

    X, y, qids = parse_svmlight(os.path.join(d, "train.txt"))
    ds = SlateDataset(X, y, qids)
    np.testing.assert_array_equal(ds.flat_slate_buffers()[0], X)
