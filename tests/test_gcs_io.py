"""Every ``is_gs_path`` branch, driven through a fake gcsfs.

The fake wraps fsspec's real MemoryFileSystem, so ``put``/``get``/``open``
keep genuine fsspec path semantics (recursive uploads, trailing-slash
contents-vs-nest behavior) — a signature drift or a layout regression in
``copy_local_to_gs`` fails here instead of in production.
(reference: allrank/utils/file_utils.py:54-80 — gsutil cp semantics)
"""

import json
import os

import numpy as np
import pytest

import allrank_tpu.utils.file_utils as fu


class FakeGCSFileSystem:
    """gs://bucket/key -> memory:///bucket/key, with real fsspec transfer
    logic underneath."""

    def __init__(self, *args, **kwargs):
        import fsspec

        self.mem = fsspec.filesystem("memory")

    @staticmethod
    def _strip(path: str) -> str:
        return "/" + str(path).replace("gs://", "", 1).lstrip("/") \
            if str(path).startswith("gs://") else str(path)

    def open(self, path, mode="rb"):
        return self.mem.open(self._strip(path), mode)

    def put(self, lpath, rpath, recursive=False):
        return self.mem.put(lpath, self._strip(rpath), recursive=recursive)

    def get(self, rpath, lpath, recursive=False):
        return self.mem.get(self._strip(rpath), lpath, recursive=recursive)

    def find(self, path):
        return self.mem.find(self._strip(path))


@pytest.fixture
def fake_gcs(monkeypatch):
    import fsspec
    import gcsfs

    fsspec.filesystem("memory").store.clear()
    monkeypatch.setattr(gcsfs, "GCSFileSystem", FakeGCSFileSystem)
    yield FakeGCSFileSystem()
    fsspec.filesystem("memory").store.clear()


def _make_tree(root):
    os.makedirs(os.path.join(root, "results", "r1"), exist_ok=True)
    with open(os.path.join(root, "results", "r1", "model.npz"), "wb") as f:
        f.write(b"fake-model")
    with open(os.path.join(root, "top.json"), "w") as f:
        json.dump({"k": 1}, f)


class TestIsGsPath:
    def test_schemes(self):
        assert fu.is_gs_path("gs://bucket/path")
        assert not fu.is_gs_path("/local/path")
        assert not fu.is_gs_path("file:///x")
        assert not fu.is_gs_path("s3://bucket/x")


class TestPathsContainer:
    def test_gs_job_dir_gets_local_tempdir(self):
        p = fu.PathsContainer.from_args("gs://bucket/job", "r1", "/cfg.json")
        assert p.base_output_path == "gs://bucket/job"
        assert not fu.is_gs_path(p.local_base_output_path)
        assert os.path.isdir(p.local_base_output_path)
        assert p.output_dir == os.path.join(
            p.local_base_output_path, "results", "r1")
        assert p.config_path == "/cfg.json"

    def test_local_job_dir_is_used_directly(self, tmp_path):
        p = fu.PathsContainer.from_args(str(tmp_path), "r2", "/cfg.json")
        assert p.local_base_output_path == str(tmp_path)
        assert p.base_output_path == str(tmp_path)

    def test_file_uri_is_unwrapped(self, tmp_path):
        p = fu.PathsContainer.from_args(f"file://{tmp_path}", "r3", "/c.json")
        assert p.local_base_output_path == str(tmp_path)


class TestOpenLocalOrGs:
    def test_gs_write_then_read(self, fake_gcs):
        with fu.open_local_or_gs("gs://bucket/file.txt", "w") as f:
            f.write("payload")
        with fu.open_local_or_gs("gs://bucket/file.txt", "r") as f:
            assert f.read() == "payload"

    def test_local_passthrough(self, tmp_path):
        p = str(tmp_path / "x.txt")
        with fu.open_local_or_gs(p, "w") as f:
            f.write("local")
        with open(p) as f:
            assert f.read() == "local"


class TestCopyLocalToGs:
    def test_fresh_destination_gets_contents(self, fake_gcs, tmp_path):
        _make_tree(str(tmp_path))
        fu.copy_local_to_gs(str(tmp_path), "gs://bucket/job")
        found = set(fake_gcs.find("gs://bucket/job"))
        assert "/bucket/job/results/r1/model.npz" in found
        assert "/bucket/job/top.json" in found

    def test_existing_destination_still_gets_contents(self, fake_gcs,
                                                      tmp_path):
        """Regression: with a pre-existing job prefix (every rerun), a bare
        fs.put(local, dst) nests under basename(local) — the random tempdir
        name. Contents must land at dst regardless."""
        with fake_gcs.open("gs://bucket/job/previous_run.txt", "wb") as f:
            f.write(b"old")
        _make_tree(str(tmp_path))
        fu.copy_local_to_gs(str(tmp_path), "gs://bucket/job")
        found = set(fake_gcs.find("gs://bucket/job"))
        assert "/bucket/job/results/r1/model.npz" in found, found
        base = os.path.basename(str(tmp_path))
        assert not any(base in p for p in found), found


class TestCopyFileToLocal:
    def test_gs_download(self, fake_gcs):
        with fake_gcs.open("gs://bucket/data.bin", "wb") as f:
            f.write(b"\x00\x01payload")
        local = fu.copy_file_to_local("gs://bucket/data.bin")
        with open(local, "rb") as f:
            assert f.read() == b"\x00\x01payload"

    def test_local_copy(self, tmp_path):
        src = tmp_path / "src.txt"
        src.write_text("stuff")
        local = fu.copy_file_to_local(str(src))
        assert local != str(src)
        with open(local) as f:
            assert f.read() == "stuff"


class TestCheckpointFromGs:
    def test_load_params_from_gs_uri(self, fake_gcs, tmp_path):
        from allrank_tpu.training.checkpoint import load_params, save_params

        template = {"w": np.zeros((3, 2), np.float32),
                    "b": np.zeros((2,), np.float32)}
        trained = {"w": np.arange(6, dtype=np.float32).reshape(3, 2),
                   "b": np.array([1.0, -1.0], np.float32)}
        local = str(tmp_path / "model.npz")
        save_params(trained, local)
        with open(local, "rb") as f:
            payload = f.read()
        with fake_gcs.open("gs://bucket/ckpt/model.npz", "wb") as f:
            f.write(payload)

        loaded = load_params(template, "gs://bucket/ckpt/model.npz")
        np.testing.assert_array_equal(loaded["w"], trained["w"])
        np.testing.assert_array_equal(loaded["b"], trained["b"])


class TestTrainCliWithGsJobDir:
    def test_end_to_end_sync_after_fit(self, fake_gcs, tmp_path):
        """The main CLI's gs:// branch: train locally into the tempdir
        mirror, then sync everything to the bucket
        (reference: allrank/main.py:105-107)."""
        from argparse import Namespace

        from allrank_tpu.data.dummy import write_dummy_dataset
        from allrank_tpu.main import run
        from tests.training.test_fit import _tiny_config_dict

        data_dir = str(tmp_path / "dummy_data")
        write_dummy_dataset(data_dir, num_queries=48, results_len=12,
                            num_features=16)
        cfg = _tiny_config_dict(data_dir)
        cfg["training"]["epochs"] = 2
        cfg["expected_metrics"] = {}
        config_path = str(tmp_path / "config.json")
        with open(config_path, "w") as f:
            json.dump(cfg, f)

        run(Namespace(job_dir="gs://bucket/exp", run_id="gsrun",
                      config_file_name=config_path))

        found = set(fake_gcs.find("gs://bucket/exp"))
        expected = {
            "/bucket/exp/results/gsrun/experiment_result.json",
            "/bucket/exp/results/gsrun/model.npz",
            "/bucket/exp/results/gsrun/used_config.json",
        }
        assert expected <= found, found
        with fake_gcs.open(
            "gs://bucket/exp/results/gsrun/experiment_result.json", "rb"
        ) as f:
            result = json.loads(f.read().decode())
        assert any(k.startswith("val_metrics/") for k in result)
