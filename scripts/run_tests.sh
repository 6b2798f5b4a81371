#!/usr/bin/env bash
# Full CI gate inside the container: native build + lint + tests
# (reference analog: scripts/run_tests.sh -> `make lint tests`).
set -eu

DIR=$(dirname "$0")
PROJECT_DIR="$(cd "$DIR/.."; pwd)"

command -v docker >/dev/null || { echo "docker not found on PATH" >&2; exit 1; }

docker run -v "$PROJECT_DIR":/allrank_tpu allrank_tpu:latest \
    /bin/sh -c 'make ci'
