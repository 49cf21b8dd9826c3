"""Benchmark: SemanticKITTI-scale 4-frame sequence inference throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "points/sec/chip", "vs_baseline": N}

Metric definition (BASELINE.md north star): total REAL points processed
(masked returns, recorded as points_per_frame in bench_details) across the
4 frames of a sequence divided by wall time per sequence, on one chip,
flagship gru-gru-aflow-gru model at SemanticKITTI scale, sigma 0.6.  The
padded row count (max_points) drives the actual work, so cross-run
comparisons must hold points_per_frame fixed; r1's number counted 120k
points in the same 131072-row padding.

Geometry (r2, VERDICT item 6): scans come from the ray-cast LiDAR simulator
(data/lidar_like.py) -- ring structure, range-dependent density, pose drift
-- whose lattice occupancy matches real SemanticKITTI (~20-35k occupied
level-0 vertices per 4-frame union at sigma 0.6; measured by
scripts/occupancy.py and recorded in bench_details.json).  Static capacities
are sized to that occupancy with ~40% headroom.  The r1 uniform-ish
synthetic generator saturated a 98304-vertex table from frame 0 (silently
dropping vertices) and is kept behind --generator synthetic for
cross-round comparison.

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is the
ratio against a documented ESTIMATE of the reference's A100 throughput:
~50 ms/frame for the CUDA pipeline on ~120k-point scans -> 4*120k/0.2 s
= 2.4M points/sec.  This constant is an engineering estimate, not a
measured baseline, and is recorded here so the ratio's meaning is explicit.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
from temporal_latticenet_tpu.data.lidar_like import lidar_sequence
from temporal_latticenet_tpu.data.synthetic import synthetic_sequence
from temporal_latticenet_tpu.models import LNNSeq
from temporal_latticenet_tpu.train.engine import make_sequence_forward

REFERENCE_A100_POINTS_PER_SEC_ESTIMATE = 2.4e6


def _baseline_bounds():
    import functools

    @functools.cache
    def load():
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "roofline", os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "scripts", "roofline.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.bounds()
    return load()

FLAGSHIP = ModelConfig(
    nr_classes=26,
    rnn_modules=("gru", "gru", "aflow", "gru"),
    frames_per_seq=4,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=0,
                    help="target points per scan (lidar: ray count); "
                    "0 = fill max-points (the static row count that "
                    "actually drives the work)")
    ap.add_argument("--max-points", type=int, default=131_072)
    ap.add_argument("--capacity", type=int, default=0,
                    help="level-0 capacity; 0 = per-generator default")
    ap.add_argument("--generator", choices=("lidar", "synthetic"),
                    default="lidar")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--batched-pointnet", dest="batched_pointnet",
                    action="store_true", default=True,
                    help="pointnet for all frames at once over the "
                    "union-sorted rows (Pallas segmented max; default)")
    ap.add_argument("--no-batched-pointnet", dest="batched_pointnet",
                    action="store_false",
                    help="A/B: per-frame pointnet scatters")
    ap.add_argument("--trim-capacity", type=int, default=-1,
                    help="trimmed-frame level-0 capacity (frames 0..T-2 run "
                    "on row prefixes; RuntimeConfig.trim_capacity_level0). "
                    "-1 = per-generator default (lidar: 36864 = 1.2x the "
                    "measured frame-(T-2) occupancy 30827, "
                    "scripts/occupancy.py); 0 disables")
    ap.add_argument("--final-capacity", type=int, default=-1,
                    help="FINAL-frame level-0 capacity (the last frame's "
                    "network runs on a row prefix; "
                    "RuntimeConfig.final_capacity_level0). -1 = "
                    "per-generator default (lidar: 40960 = 1.17x the "
                    "measured final-union occupancy 34986); 0 disables")
    args = ap.parse_args()

    # capacity defaults sized to measured occupancy (scripts/occupancy.py):
    # lidar 4-frame union peaks ~35k level-0 vertices -> 49152 (~40% head);
    # the legacy synthetic generator needs the r1 sizing
    capacity = args.capacity or (49152 if args.generator == "lidar"
                                 else 98304)
    trim = (args.trim_capacity if args.trim_capacity >= 0
            else (36864 if args.generator == "lidar" else 0))
    ftrim = (args.final_capacity if args.final_capacity >= 0
             else (40960 if args.generator == "lidar" else 0))
    rt = RuntimeConfig(max_points=args.max_points,
                       capacity_level0=capacity,
                       capacity_decay=0.5, min_capacity=8192, sigma=0.6,
                       batched_pointnet=args.batched_pointnet,
                       trim_capacity_level0=trim,
                       final_capacity_level0=ftrim)
    cfg = FLAGSHIP
    model = LNNSeq(cfg, rt)
    seq_fwd = make_sequence_forward(model, cfg, rt)

    rng = np.random.default_rng(0)
    points = args.points or rt.max_points
    if args.generator == "lidar":
        # --points controls the ray count (64 beams x points/64 azimuths);
        # actual returns come out ~6% lower (sky / out-of-range rays).
        # Default fills max_points rays: the padded row count is static, so
        # fewer real returns do the same work for fewer counted points.
        p, v, l, m = lidar_sequence(rng, frames=args.frames,
                                    max_points=rt.max_points,
                                    n_az=max(256, points // 64))
    else:
        p, v, l, m = synthetic_sequence(rng, frames=args.frames,
                                        n_points=min(points, rt.max_points),
                                        max_points=rt.max_points)
    positions, values, mask = jnp.asarray(p), jnp.asarray(v), jnp.asarray(m)
    points_per_frame = int(m.sum(1).mean())

    from temporal_latticenet_tpu.models import init_state
    init_fn = jax.jit(lambda k, p_, v_, m_, s: model.init(k, p_, v_, m_, s,
                                                          final=True))
    variables = init_fn(jax.random.PRNGKey(0), positions[0], values[0],
                        mask[0], init_state(cfg, rt))
    params = {"params": variables["params"]}

    # reduce on device and fetch the scalar to host: a plain
    # block_until_ready can be a no-op through remote-TPU proxies, so the
    # timing loop forces a real round-trip through the full computation.
    # The forward's aux carries per-level occupancy, so the honesty check
    # below costs no extra compile.
    caps = rt.capacities(cfg.nr_downsamples)

    def _fwd(prm, p_, v_, m_):
        logp, sv, aux = seq_fwd(prm, p_, v_, m_)
        return logp.sum(), aux["occupancy"], aux["trim_overflow"]

    fwd = jax.jit(_fwd)

    t0 = time.perf_counter()
    s, occ, trim_over = fwd(params, positions, values, mask)
    float(s)
    compile_s = time.perf_counter() - t0
    occupancy = [int(x) for x in np.asarray(occ)]
    trim_overflowed = bool(trim_over)

    # honesty check: a saturated table silently drops vertices, making the
    # measured workload SMALLER than the input deserves (the r1 failure)
    saturated = [o >= c for o, c in zip(occupancy, caps)]
    if any(saturated):
        import sys
        print(f"WARNING: vertex table saturated (occupancy {occupancy} vs "
              f"capacities {list(caps)}); the headline number is measured "
              f"with dropped vertices -- raise --capacity", file=sys.stderr)
    if trim_overflowed:
        import sys
        print(f"WARNING: trim capacity overflow (trim "
              f"{rt.trim_capacities(2)} < frame-{args.frames - 2} occupancy "
              f"or final {rt.final_capacities(2)} < final-union occupancy); "
              f"frames dropped vertex compute -- raise --trim-capacity / "
              f"--final-capacity", file=sys.stderr)

    for _ in range(args.warmup):
        float(fwd(params, positions, values, mask)[0])

    # Headline protocol: run the iterations INSIDE one jitted fori_loop, so
    # the ~31 ms-per-dispatch tunnel round-trip (an artifact of this remote
    # dev setup -- a production host dispatches in ~0.1 ms, and the A100
    # reference estimate carries no such tax) is amortised across the
    # batch.  Each iteration perturbs positions by i*1e-12 m (physically
    # nil, numerically sufficient to stop XLA hoisting the loop-invariant
    # body) and the carried sum forces every iteration to execute.
    # Secondary protocols recorded in bench_details: per-iteration host
    # fetch (charges the round-trip to every sequence) and queue-then-fetch
    # pipelining (A/B'd 5.7x SLOWER through the axon proxy -- async
    # dispatch without intermediate syncs degrades pathologically there).
    n_loop = args.iters

    @jax.jit
    def fwd_loop(prm, p_, v_, m_):
        def body(i, acc):
            s, _, _ = _fwd(prm, p_ + jnp.float32(i) * 1e-12, v_, m_)
            return acc + s
        return jax.lax.fori_loop(0, n_loop, body, jnp.float32(0.0))

    float(fwd_loop(params, positions, values, mask))  # compile + warm
    t0 = time.perf_counter()
    float(fwd_loop(params, positions, values, mask))
    # the single dispatch round-trip stays included, amortised over iters
    dt = (time.perf_counter() - t0) / args.iters

    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(fwd(params, positions, values, mask)[0])
    dt_synced = (time.perf_counter() - t0) / args.iters
    t0 = time.perf_counter()
    sums = [fwd(params, positions, values, mask)[0]
            for _ in range(args.iters)]
    float(jnp.stack(sums).sum())
    dt_pipelined = (time.perf_counter() - t0) / args.iters

    pts_per_sec = args.frames * points_per_frame / dt
    result = {
        "metric": "semantickitti_4frame_seq_inference",
        "value": round(pts_per_sec, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(pts_per_sec / REFERENCE_A100_POINTS_PER_SEC_ESTIMATE, 3),
    }
    print(json.dumps(result))
    # extra context on stderr-style secondary line is avoided: driver wants
    # one JSON line; details go to a sidecar file
    with open("bench_details.json", "w") as f:
        json.dump({**result, "seconds_per_sequence": dt,
                   "seconds_per_sequence_synced": dt_synced,
                   "seconds_per_sequence_pipelined": dt_pipelined,
                   "timing_protocol": "on-device fori_loop over iters "
                   "(one host dispatch, amortised); synced = one host "
                   "round-trip per sequence (~31 ms tunnel tax each)",
                   "compile_seconds": compile_s,
                   "points_per_frame": points_per_frame,
                   "frames": args.frames,
                   "generator": args.generator,
                   "capacities": list(caps),
                   "trim_capacities": (list(rt.trim_capacities(2))
                                       if rt.trim_capacity_level0 else None),
                   "final_capacities": (list(rt.final_capacities(2))
                                        if rt.final_capacity_level0
                                        else None),
                   "occupancy_final_union": occupancy,
                   "saturated": any(saturated),
                   "trim_overflowed": trim_overflowed,
                   # the A100 constant is an ESTIMATE (the reference
                   # publishes no numbers; paper unfetchable here).
                   # Derived bounds (scripts/roofline.py, docs/DESIGN.md):
                   # per-stage bytes/FLOPs of the reference's own algorithm
                   # x explicit A100 efficiency assumptions.
                   "baseline_bounds": _baseline_bounds(),
                   "vs_baseline_range": [
                       round(pts_per_sec
                             / _baseline_bounds()[
                                 "a100_tuned_kernels_pts_per_s"], 3),
                       round(pts_per_sec
                             / _baseline_bounds()["a100_floor_pts_per_s"],
                             3)],
                   "backend": jax.default_backend(),
                   "device": str(jax.devices()[0])}, f, indent=2)


if __name__ == "__main__":
    main()
