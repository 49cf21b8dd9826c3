#!/bin/bash
# Moving-class controlled comparison (VERDICT r2 item 2): the flagship
# temporal model vs the single-frame static model vs accumulate_clouds on
# identical dynamic-actor worlds.  Serialized: one TPU, one compile service.
#
# r3 protocol: actor-only car population (no background cars -- see
# lidar_like._make_world include_cars), marginal-matched parked
# counterparts, 48 epochs.
set -x
EPOCHS=${EPOCHS:-48}
SCALE=${SCALE:-small}
WORLDS=${WORLDS:-10}
SCANS=${SCANS:-12}
ROOT=${ROOT:-/tmp/moving_r3}
for variant in temporal static accum; do
  python -u scripts/train_lidar.py --variant $variant --moving 1 \
    --worlds $WORLDS --scans $SCANS --epochs $EPOCHS --scale $SCALE \
    --root $ROOT \
    --out artifacts/moving_${variant}_${SCALE}.json \
    2>&1 | tail -20
done
