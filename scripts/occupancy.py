"""Measure per-level lattice occupancy for the bench generators (CPU).

VERDICT r1: "record occupancy in bench_details and bench on realistic
geometry".  Prints per-level final union counts (4-frame sequence) for the
legacy synthetic generator and the ray-cast LiDAR simulator, plus per-frame
new-vertex growth, to size honest static capacities.
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def measure(name, p, m, caps, sigma, nr_downsamples):
    from temporal_latticenet_tpu.ops import seq_lattice as sl
    lat = jax.jit(lambda p_, m_: sl.build_sequence_lattice(
        p_, m_, sigma, caps, nr_downsamples))(jnp.asarray(p), jnp.asarray(m))
    print(f"\n{name}: points/frame={int(m.sum(1)[0])} (mask), caps={caps}")
    for l, lvl in enumerate(lat.levels):
        counts = np.asarray(lvl.counts)
        print(f"  level {l}: per-frame counts {counts.tolist()} "
              f"(cap {caps[l]}, fill {counts[-1]/caps[l]:.2f})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=120_000)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--capacity", type=int, default=98_304)
    args = ap.parse_args()

    from temporal_latticenet_tpu.config import RuntimeConfig
    from temporal_latticenet_tpu.data.synthetic import synthetic_sequence
    from temporal_latticenet_tpu.data.lidar_like import lidar_sequence

    max_pts = 131072
    # decay 0.5 matches the capacities bench.py and the shipped runtime
    # configs actually run with (fill ratios are against REAL capacities)
    rt = RuntimeConfig(max_points=max_pts, capacity_level0=args.capacity,
                       capacity_decay=0.5, min_capacity=8192, sigma=0.6)
    caps = rt.capacities(2)

    rng = np.random.default_rng(0)
    p, v, l, m = synthetic_sequence(rng, args.frames, args.points, max_pts)
    measure("synthetic (legacy bench)", p, m, caps, rt.sigma, 2)

    rng = np.random.default_rng(0)
    p, v, l, m = lidar_sequence(rng, args.frames, max_pts)
    measure("lidar_like (ray-cast)", p, m, caps, rt.sigma, 2)


if __name__ == "__main__":
    main()
