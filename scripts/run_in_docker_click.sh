#!/usr/bin/env bash
# Rank-and-click inside the container, reusing the model trained by
# run_in_docker.sh (reference analog: scripts/run_in_docker_click.sh).
set -eu

DIR=$(dirname "$0")
PROJECT_DIR="$(cd "$DIR/.."; pwd)"

command -v docker >/dev/null || { echo "docker not found on PATH" >&2; exit 1; }

docker run -e PYTHONPATH=/allrank_tpu -v "$PROJECT_DIR":/allrank_tpu \
    allrank_tpu:latest /bin/sh -c '
        python -m allrank_tpu.rank_and_click \
            --config-file-name /allrank_tpu/scripts/local_config_click_model.json \
            --run-id test_run_click --job-dir /allrank_tpu/task-data \
            --input-model-path /allrank_tpu/task-data/results/test_run/model.npz \
            --roles train,vali'
