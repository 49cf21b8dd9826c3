"""Occupancy probe for the on-disk train_lidar.py worlds (CPU).

CLAUDE.md rule: re-measure occupancy before choosing capacities for a new
generator/scale combination.  Generates worlds at the requested scale /
moving setting with scripts/train_lidar.py's own writer, loads 4-scan
pose-compensated windows through the real loader, and prints the
worst-case per-level union counts against the scale's capacities.

Usage: python scripts/occupancy_worlds.py --scale medium --moving 0
"""

import argparse
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="medium")
    ap.add_argument("--moving", type=int, default=0)
    ap.add_argument("--scans", type=int, default=12)
    ap.add_argument("--worlds", type=int, default=2)
    ap.add_argument("--stride", type=int, default=3,
                    help="probe every stride-th window (CPU unions are slow)")
    ap.add_argument("--cap0", type=int, default=0,
                    help="override level-0 probe capacity (a saturated probe"
                         " hides the true occupancy)")
    ap.add_argument("--min-cap", type=int, default=0)
    args = ap.parse_args()

    from train_lidar import SCALES, write_moving_world
    from temporal_latticenet_tpu.config import RuntimeConfig
    from temporal_latticenet_tpu.data.kitti import SemanticKittiDataset
    from temporal_latticenet_tpu.ops import seq_lattice as sl

    beams, n_az, max_points, cap0, min_cap = SCALES[args.scale]
    cap0 = args.cap0 or cap0
    min_cap = args.min_cap or min_cap
    rt = RuntimeConfig(max_points=max_points, capacity_level0=cap0,
                       capacity_decay=0.5, min_capacity=min_cap, sigma=0.6)
    caps = rt.capacities(2)

    build = jax.jit(lambda p_, m_: tuple(
        lvl.counts[-1] for lvl in
        sl.build_sequence_lattice(p_, m_, rt.sigma, caps, 2).levels))

    worst = [0] * len(caps)
    with tempfile.TemporaryDirectory() as root:
        for w in range(args.worlds):
            write_moving_world(root, f"{w:02d}", args.scans, beams, n_az,
                               bool(args.moving), seed=1000 + w)
        lc = dict(dataset_path=root, include_moving_classes=True,
                  frames_per_seq=4, cloud_scope=1, do_pose=True,
                  shuffle_points=False, measure_sequence_lengths=True,
                  transformer={})
        ds = SemanticKittiDataset("train", lc, {}, sequence_learning=True,
                                  max_points=max_points)
        for i in range(0, len(ds), args.stride):
            frames = ds[i]
            p = jnp.asarray(np.stack([f.positions for f in frames]))
            m = jnp.asarray(np.stack([f.mask for f in frames]))
            counts = [int(c) for c in build(p, m)]
            worst = [max(a, b) for a, b in zip(worst, counts)]
            print(f"window {i + 1}/{len(ds)}: counts {counts}", flush=True)
    print(f"\nscale={args.scale} moving={args.moving} caps={list(caps)}")
    print("worst-case union counts:", worst,
          " fill:", [f"{w / c:.2f}" for w, c in zip(worst, caps)])


if __name__ == "__main__":
    main()
