#!/usr/bin/env bash
# Train the example config inside the container
# (reference analog: scripts/run_in_docker.sh).
#
# before start - from the main dir run:
#   docker build -t allrank_tpu:latest .
set -eu

DIR=$(dirname "$0")
PROJECT_DIR="$(cd "$DIR/.."; pwd)"

command -v docker >/dev/null || { echo "docker not found on PATH" >&2; exit 1; }

docker run -e PYTHONPATH=/allrank_tpu -v "$PROJECT_DIR":/allrank_tpu \
    allrank_tpu:latest /bin/sh -c '
        python -m allrank_tpu.data.dummy --output_dir /allrank_tpu/dummy_data &&
        python -m allrank_tpu.main \
            --config-file-name /allrank_tpu/scripts/local_config.json \
            --run-id test_run --job-dir /allrank_tpu/task-data'
