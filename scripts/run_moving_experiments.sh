#!/bin/bash
# Moving-class controlled comparison (VERDICT r2 item 2): the flagship
# temporal model vs the single-frame static model vs accumulate_clouds on
# identical dynamic-actor worlds.  Serialized: one TPU, one compile service.
#
# r3 protocol: actor-only car population (no background cars -- see
# lidar_like._make_world include_cars), marginal-matched parked
# counterparts, 48 epochs.
set -x
set -o pipefail  # the retry below reads python's exit code through tail
EPOCHS=${EPOCHS:-48}
SCALE=${SCALE:-small}
WORLDS=${WORLDS:-10}
SCANS=${SCANS:-12}
REMAT=${REMAT:-full}
ROOT=${ROOT:-/tmp/moving_r3}
for variant in temporal static accum; do
  # retry + --resume: transient TPU-tunnel failures (INTERNAL backend
  # errors) otherwise lose the whole run; resume restarts from the newest
  # per-epoch checkpoint
  for attempt in 1 2 3 4; do
    python -u scripts/train_lidar.py --variant $variant --moving 1 \
      --worlds $WORLDS --scans $SCANS --epochs $EPOCHS --scale $SCALE \
      --root $ROOT --resume --remat $REMAT \
      --out artifacts/moving_${variant}_${SCALE}.json \
      2>&1 | tail -20
    rc=$?
    [ $rc -eq 0 ] && break
    echo "variant $variant attempt $attempt failed (exit $rc); resuming"
    sleep 30
  done
done
