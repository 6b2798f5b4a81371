#!/usr/bin/env bash
# Build the image, then run the containerized CI gate
# (reference analog: scripts/ci.sh).
set -eu

DIR=$(dirname "$0")
PROJECT_DIR="$(cd "$DIR/.."; pwd)"

command -v docker >/dev/null || { echo "docker not found on PATH" >&2; exit 1; }

docker build -t allrank_tpu:latest "$PROJECT_DIR"
"$PROJECT_DIR/scripts/run_tests.sh"
