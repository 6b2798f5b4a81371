"""Output path management and local/GCS IO
(reference: allrank/utils/file_utils.py:16-80)."""

from __future__ import annotations

import os
import shutil
import tempfile
from dataclasses import dataclass
from urllib.parse import urlparse

from allrank_tpu.utils.ltr_logging import get_logger

logger = get_logger()


def get_path_from_local_uri(uri) -> str:
    parsed = urlparse(uri)
    if parsed.scheme == "file":
        return parsed.netloc + parsed.path
    return uri


def is_gs_path(uri) -> bool:
    return urlparse(uri).scheme == "gs"


@dataclass
class PathsContainer:
    local_base_output_path: str
    base_output_path: str
    output_dir: str
    tensorboard_output_path: str
    config_path: str

    @classmethod
    def from_args(cls, job_dir: str, run_id: str, config_path: str) -> "PathsContainer":
        base_output_path = get_path_from_local_uri(job_dir)
        if is_gs_path(base_output_path):
            local_base_output_path = tempfile.mkdtemp()
        else:
            local_base_output_path = base_output_path
        output_dir = os.path.join(local_base_output_path, "results", run_id)
        tensorboard_output_path = os.path.join(
            local_base_output_path, "tb_evals", "single", run_id
        )
        return cls(
            local_base_output_path, base_output_path, output_dir,
            tensorboard_output_path, config_path,
        )


def create_output_dirs(output_path: str) -> None:
    for subdir in ["models", "evals", "predictions"]:
        os.makedirs(os.path.join(output_path, subdir), exist_ok=True)


def open_local_or_gs(path, mode):
    if is_gs_path(path):
        import gcsfs

        return gcsfs.GCSFileSystem().open(path, mode)
    return open(path, mode)


def copy_local_to_gs(source_local: str, destination_uri: str) -> None:
    """Recursively upload the CONTENTS of ``source_local`` under
    ``destination_uri`` (reference semantics: ``gsutil cp -r src/* dst``,
    allrank/utils/file_utils.py:77-80).

    The trailing slash on the source matters: without it, fsspec nests the
    upload under ``basename(source_local)`` whenever the destination prefix
    already exists — for a reused job_dir that would scatter results under
    the local tempdir's random name."""
    import gcsfs

    fs = gcsfs.GCSFileSystem()
    fs.put(source_local.rstrip("/") + "/", destination_uri.rstrip("/") + "/",
           recursive=True)


def copy_file_to_local(uri: str) -> str:
    temp_dir = tempfile.mkdtemp()
    local_file = os.path.join(temp_dir, "local_file")
    if is_gs_path(uri):
        import gcsfs

        gcsfs.GCSFileSystem().get(uri, local_file)
    else:
        shutil.copy(uri, local_file)
    return local_file
