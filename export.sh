#!/usr/bin/env bash
# Export the container image as a gzipped tarball for upload
# (reference export.sh capability).
set -euo pipefail
docker save acouslicai_tpu:latest | gzip -c > acouslicai_tpu.tar.gz
echo "wrote acouslicai_tpu.tar.gz"
