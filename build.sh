#!/usr/bin/env bash
# Build the container image (reference build.sh capability).
set -euo pipefail
SCRIPTPATH="$(cd "$(dirname "$0")" && pwd)"
docker build -t acouslicai_tpu:v0.1.0 -t acouslicai_tpu:latest "$SCRIPTPATH"
