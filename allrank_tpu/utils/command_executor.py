"""Shell command wrapper (reference: allrank/utils/command_executor.py:9-14).

The TPU framework's own IO paths use shutil/gcsfs directly; this survives for
user scripts and drop-in compatibility. Uses subprocess (not os.system) and
raises on non-zero exit.
"""

from __future__ import annotations

import subprocess

from allrank_tpu.utils.ltr_logging import get_logger

logger = get_logger()


def execute_command(command: str) -> None:
    logger.info("will execute %s", command)
    result = subprocess.run(command, shell=True)
    if result.returncode != 0:
        raise RuntimeError(
            f"command exited with a non-zero code: {command} "
            f"(exit code {result.returncode})"
        )
