#!/usr/bin/env bash
# Train on dummy data, then regenerate a click-through dataset with the
# configured click model (reference: scripts/run_in_docker_click.sh).
set -euo pipefail

DIR=$(dirname "$0")
PROJECT_DIR="$(cd "$DIR/.."; pwd)"
cd "$PROJECT_DIR"

python -m allrank_tpu.data.dummy --output_dir dummy_data
python -m allrank_tpu.main \
  --config-file-name "$PROJECT_DIR/scripts/local_config_click_model.json" \
  --run-id click_run --job-dir "$PROJECT_DIR/test_run"
python -m allrank_tpu.rank_and_click \
  --config-file-name "$PROJECT_DIR/scripts/local_config_click_model.json" \
  --run-id click_run_clicks --job-dir "$PROJECT_DIR/test_run" \
  --input-model-path "$PROJECT_DIR/test_run/results/click_run/model.npz" \
  --roles train,vali
