#!/usr/bin/env bash
# End-to-end smoke run on generated dummy data
# (reference: scripts/run_example.sh — docker-free TPU-native version).
set -euo pipefail

DIR=$(dirname "$0")
PROJECT_DIR="$(cd "$DIR/.."; pwd)"
cd "$PROJECT_DIR"

make native || true
python -m allrank_tpu.data.dummy --output_dir dummy_data
python -m allrank_tpu.main \
  --config-file-name "$PROJECT_DIR/scripts/local_config.json" \
  --run-id test_run \
  --job-dir "$PROJECT_DIR/test_run"
