#!/usr/bin/env bash
# Build the image (analog of /root/reference/seq_docker/build.sh, minus the
# CUDA keyring download -- TPU runtimes come from the host VM image).
set -e
if [ "$#" -ne 1 ]; then
  echo "usage: ./build.sh IMAGE_NAME"
  exit 1
fi
cd "$(dirname "$0")/.."
docker build \
  --build-arg user="$USER" \
  --build-arg uid="$UID" \
  --build-arg workspace="/workspace/" \
  -t "$1" \
  -f docker/Dockerfile .
