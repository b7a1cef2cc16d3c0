#!/usr/bin/env bash
# Local smoke run WITHOUT docker (runs the same contract in-process):
# reads ./test/input, writes ./test/output. Resource limits are the host's.
set -euo pipefail
SCRIPTPATH="$(cd "$(dirname "$0")" && pwd)"
cd "$SCRIPTPATH"
MODEL_TAG="${MODEL_TAG:-att_aspp}" CASE_ID="${CASE_ID:-output}" \
  python inference.py
echo "outputs in $SCRIPTPATH/test/output"
