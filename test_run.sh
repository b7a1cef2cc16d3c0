#!/usr/bin/env bash
# Grand-Challenge-faithful containerised smoke run (reference test_run.sh):
# rebuild, run with no network and a no-op /tmp volume, /input and /output
# bind mounts, then fix output ownership.
set -euo pipefail
SCRIPTPATH="$(cd "$(dirname "$0")" && pwd)"

./build.sh

VOLUME="acouslicai_tpu-output-$RANDOM"
docker volume create "$VOLUME"

docker run --rm \
  --network none \
  --memory 32g --shm-size 2g \
  -v "$SCRIPTPATH/test/input":/input:ro \
  -v "$SCRIPTPATH/test/output":/output \
  -v "$VOLUME":/tmp \
  acouslicai_tpu:latest

docker run --rm \
  -v "$SCRIPTPATH/test/output":/output \
  --entrypoint /bin/sh acouslicai_tpu:latest \
  -c "chown -R $(id -u):$(id -g) /output" || true

docker volume rm "$VOLUME"
echo "outputs in $SCRIPTPATH/test/output"
