#!/usr/bin/env bash
# Run the container (analog of /root/reference/seq_docker/run.sh).  TPU VMs
# expose the accelerator via /dev/accel* + --privileged instead of --gpus;
# datasets bind-mount exactly like the reference (run.sh:26-27).
set -e
if [ "$#" -lt 1 ]; then
  echo "usage: ./run.sh IMAGE_NAME [DATASET_DIR]"
  exit 1
fi
IMAGE="$1"
DATA="${2:-/data/SemanticKitti}"
docker run -it \
  --shm-size 12G \
  --privileged \
  --net=host \
  -e DOCKER=1 \
  -e WORKSPACE="/workspace/" \
  --mount type=bind,source="$DATA",target=/workspace/Data/SemanticKitti \
  "$IMAGE" bash
