"""Benchmark: SemanticKITTI-scale 4-frame sequence inference throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "points/sec/chip", "vs_baseline": N}

Metric definition (BASELINE.md north star): total REAL points processed
(masked returns, recorded as points_per_frame in bench_details) across the
4 frames of a sequence divided by wall time per sequence, on one chip,
flagship gru-gru-aflow-gru model at SemanticKITTI scale, sigma 0.6.  The
padded row count (max_points) drives the actual work, so cross-run
comparisons must hold points_per_frame fixed.

Survival-first structure (VERDICT r3 item 1 -- the r3 driver capture timed
out mid-compile, rc 124):
  * ONE bench-scale compile: the headline fori_loop graph itself carries the
    occupancy/trim honesty outputs, and its iteration count is a TRACED
    argument (lowers to while_loop) so changing --iters never recompiles.
  * params come from a TINY-geometry init (param shapes depend only on
    channel widths, never on capacities/max_points -- asserted at runtime
    against eval_shape of the bench-scale init), killing the second
    bench-scale compile the r3 script paid.
  * the headline JSON line is printed the moment the primary measurement
    exists; bench_details.json and the secondary timing protocols
    (--details) come after, and are skipped entirely when the budget is
    spent.
  * a watchdog thread (TLN_BENCH_BUDGET_S, default 480 s) emits the best
    measurement available so far and exits 0 before any external `timeout`
    can SIGKILL the process -- it runs even while the main thread is blocked
    inside a remote compile.  Fallback ladder: full timed loop > single
    warm sequence (includes the ~31 ms dispatch tax) > nothing (exit 3).

Geometry (r2, VERDICT item 6): scans come from the ray-cast LiDAR simulator
(data/lidar_like.py) -- ring structure, range-dependent density, pose drift
-- whose lattice occupancy matches real SemanticKITTI (~20-35k occupied
level-0 vertices per 4-frame union at sigma 0.6; measured by
scripts/occupancy.py and recorded in bench_details.json).  Static capacities
are sized to that occupancy with ~40% headroom.

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is the
ratio against a documented ESTIMATE of the reference's A100 throughput:
~50 ms/frame for the CUDA pipeline on ~120k-point scans -> 4*120k/0.2 s
= 2.4M points/sec.  This constant is an engineering estimate, not a
measured baseline; scripts/roofline.py derives the honest uncertainty band
recorded in bench_details.json.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import threading
import time

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("TLN_BENCH_BUDGET_S", "480"))

import numpy as np

import jax
import jax.numpy as jnp

# NOTE: enable_compile_cache() is called inside main() AFTER --cpu is
# parsed: it touches jax.default_backend(), which would pin the platform
# before the flag could switch it.
from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache

from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
from temporal_latticenet_tpu.data.lidar_like import lidar_sequence
from temporal_latticenet_tpu.data.synthetic import synthetic_sequence
from temporal_latticenet_tpu.models import LNNSeq, init_state
from temporal_latticenet_tpu.train.engine import make_sequence_forward

REFERENCE_A100_POINTS_PER_SEC_ESTIMATE = 2.4e6

# best-available state shared with the watchdog/signal handlers.
# RLock: a SIGTERM landing while the main thread is inside _emit() runs the
# handler on that same thread -- a plain Lock would deadlock until the
# watchdog budget expired (ADVICE r4).
_best = {"result": None, "details": None, "emitted": False}
_emit_lock = threading.RLock()


def _emit(final: bool = False) -> bool:
    """Print the headline JSON exactly once; returns True if printed."""
    with _emit_lock:
        if _best["emitted"]:
            return True
        if _best["result"] is None:
            return False
        print(json.dumps(_best["result"]), flush=True)
        _best["emitted"] = True
        if _best["details"] is not None:
            try:
                with open("bench_details.json", "w") as f:
                    json.dump(_best["details"], f, indent=2)
            except OSError:
                pass
        return True


def _watchdog():
    """Fires at the budget: flush whatever we have and hard-exit.

    Runs on a thread so it works even while the main thread is blocked in
    a remote XLA compile (a Python signal handler would not run there)."""
    emitted = _emit()
    sys.stdout.flush()
    os._exit(0 if emitted else 3)


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - T_START)


def _on_term(signum, frame):
    # mirror _watchdog: rc 3 when nothing was measured yet, so a SIGTERM
    # before the first measurement cannot masquerade as a successful run
    emitted = _emit()
    sys.stdout.flush()
    os._exit(0 if emitted else 3)


def _baseline_bounds():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "roofline", os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "scripts", "roofline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.bounds()


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
    ap.add_argument("--details", action="store_true",
                    help="also time the synced / pipelined secondary "
                    "protocols (extra compile; off by default so the "
                    "driver capture finishes inside its timeout)")
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
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (budget-guard tests; the "
                    "sitecustomize pins platforms so env vars cannot)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    # cancelled at the end of main(): a still-armed timer would os._exit a
    # host process that outlives the bench (e.g. the pytest smoke test)
    watchdog = threading.Timer(max(_remaining(), 1.0), _watchdog)
    watchdog.daemon = True
    watchdog.start()
    try:

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

        # Params from a TINY-geometry init: parameter shapes depend only on
        # channel widths (conv kernels, GN scales, fusion cells), never on the
        # vertex capacities or the padded point count, so initializing at toy
        # geometry yields the identical pytree for a fraction of the compile.
        # The eval_shape assert below proves the substitution each run.
        rt_tiny = RuntimeConfig(max_points=1024, capacity_level0=2048,
                                capacity_decay=0.5, min_capacity=512, sigma=0.6,
                                batched_pointnet=args.batched_pointnet)
        model_tiny = LNNSeq(cfg, rt_tiny)
        key = jax.random.PRNGKey(0)
        tiny_p = jnp.asarray(np.asarray(positions[0][: rt_tiny.max_points]))
        tiny_v = jnp.asarray(np.asarray(values[0][: rt_tiny.max_points]))
        tiny_m = jnp.asarray(np.asarray(mask[0][: rt_tiny.max_points]))
        init_tiny = jax.jit(lambda k, p_, v_, m_, s: model_tiny.init(
            k, p_, v_, m_, s, final=True))
        variables = init_tiny(key, tiny_p, tiny_v, tiny_m,
                              init_state(cfg, rt_tiny))
        params = {"params": variables["params"]}
        big_shapes = jax.eval_shape(
            lambda k: model.init(k, positions[0], values[0], mask[0],
                                 init_state(cfg, rt), final=True), key)
        got = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), params)
        want = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                      {"params": big_shapes["params"]})
        assert got == want, "tiny-init param tree differs from bench-scale init"

        caps = rt.capacities(cfg.nr_downsamples)

        def _fwd(prm, p_, v_, m_):
            logp, sv, aux = seq_fwd(prm, p_, v_, m_)
            return logp.sum(), aux["occupancy"], aux["trim_overflow"]

        # Headline protocol: run the iterations INSIDE one jitted loop, so the
        # ~31 ms-per-dispatch tunnel round-trip (an artifact of this remote dev
        # setup -- a production host dispatches in ~0.1 ms, and the A100
        # reference estimate carries no such tax) is amortised across the
        # batch.  Each iteration perturbs positions by i*1e-12 m (physically
        # nil, numerically sufficient to stop XLA hoisting the loop-invariant
        # body) and the carried sum forces every iteration to execute.  The
        # iteration count is a traced operand (while_loop), so --iters and the
        # budget-guard shrink below never trigger a recompile, and the carry
        # threads the honesty outputs (occupancy, trim overflow) out of the
        # last iteration -- no separate single-shot graph to compile.
        out_shapes = jax.eval_shape(_fwd, params, positions, values, mask)

        @jax.jit
        def fwd_loop(prm, p_, v_, m_, n):
            def body(i, carry):
                acc = carry[0]
                s, occ, tov = _fwd(prm, p_ + jnp.float32(i) * 1e-12, v_, m_)
                return (acc + s, occ, tov)
            carry0 = tuple(jnp.zeros(x.shape, x.dtype) for x in out_shapes)
            return jax.lax.fori_loop(0, n, body, carry0)

        t0 = time.perf_counter()
        s, occ, trim_over = fwd_loop(params, positions, values, mask,
                                     jnp.int32(1))
        float(s)
        compile_s = time.perf_counter() - t0
        occupancy = [int(x) for x in np.asarray(occ)]
        trim_overflowed = bool(trim_over)

        # honesty check: a saturated table silently drops vertices, making the
        # measured workload SMALLER than the input deserves (the r1 failure)
        saturated = [o >= c for o, c in zip(occupancy, caps)]
        if any(saturated):
            print(f"WARNING: vertex table saturated (occupancy {occupancy} vs "
                  f"capacities {list(caps)}); the headline number is measured "
                  f"with dropped vertices -- raise --capacity", file=sys.stderr)
        if trim_overflowed:
            print(f"WARNING: trim capacity overflow (trim "
                  f"{rt.trim_capacities(2)} < frame-{args.frames - 2} occupancy "
                  f"or final {rt.final_capacities(2)} < final-union occupancy); "
                  f"frames dropped vertex compute -- raise --trim-capacity / "
                  f"--final-capacity", file=sys.stderr)

        def _pack(dt, protocol, extra=None):
            pts_per_sec = args.frames * points_per_frame / dt
            result = {
                "metric": "semantickitti_4frame_seq_inference",
                "value": round(pts_per_sec, 1),
                "unit": "points/sec/chip",
                "vs_baseline": round(
                    pts_per_sec / REFERENCE_A100_POINTS_PER_SEC_ESTIMATE, 3),
            }
            details = {**result, "seconds_per_sequence": dt,
                       "timing_protocol": protocol,
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
                       "backend": jax.default_backend(),
                       "device": str(jax.devices()[0]), **(extra or {})}
            return result, details

        # warm single-sequence fallback: honest (post-compile, real data) but
        # taxed with one full dispatch round-trip; replaced by the amortised
        # loop measurement below unless the watchdog fires first.
        t0 = time.perf_counter()
        float(fwd_loop(params, positions, values, mask, jnp.int32(1))[0])
        dt_single = time.perf_counter() - t0
        _best["result"], _best["details"] = _pack(
            dt_single, "single warm sequence incl. ~31 ms dispatch round-trip "
            "(budget fallback -- the amortised loop did not finish in time)")

        # budget guard: shrink the iteration count (traced operand -- free) so
        # the timed run fits in what's left, with 30 s of slack for teardown.
        # VERDICT r4 item 8: repeat the timed loop >=3x (graph already
        # compiled, each rep is n_loop sequences) and report the MEDIAN as
        # the headline plus min/max spread -- the builder's own figures vary
        # ~2.5% run to run, so a single draw cannot distinguish plateau from
        # progress round-over-round.
        n_loop, n_reps = args.iters, 3
        if _remaining() < n_reps * n_loop * dt_single + 30.0:
            n_loop = max(1, int((_remaining() - 30.0)
                                / (n_reps * max(dt_single, 1e-3))))
            print(f"WARNING: budget nearly spent after compile "
                  f"({_remaining():.0f} s left); shrinking timed loop to "
                  f"{n_loop} iters", file=sys.stderr)

        rep_dts = []
        for rep in range(n_reps):
            t0 = time.perf_counter()
            float(fwd_loop(params, positions, values, mask,
                           jnp.int32(n_loop))[0])
            # the dispatch round-trip stays included, amortised over iters
            rep_dts.append((time.perf_counter() - t0) / n_loop)
            dt = float(np.median(rep_dts))
            _best["result"], _best["details"] = _pack(
                dt, "on-device fori_loop over iters (one host dispatch, "
                "amortised; median of reps)",
                {"iters": n_loop, "reps": rep + 1,
                 "seconds_per_sequence_reps": rep_dts,
                 "seconds_per_sequence_min": min(rep_dts),
                 "seconds_per_sequence_max": max(rep_dts),
                 "seconds_per_sequence_single": dt_single})
            if _remaining() < n_loop * dt + 15.0:
                break
        _emit()  # headline out NOW; everything past this point is optional

        # ---- optional extras: baseline bounds + secondary protocols ----
        details = dict(_best["details"])
        try:
            bounds = _baseline_bounds()
            pts_per_sec = details["value"]
            details["baseline_bounds"] = bounds
            details["vs_baseline_range"] = [
                round(pts_per_sec / bounds["a100_tuned_kernels_pts_per_s"], 3),
                round(pts_per_sec / bounds["a100_floor_pts_per_s"], 3)]
        except Exception as e:  # roofline is decoration, never fatal
            details["baseline_bounds_error"] = repr(e)

        if args.details and _remaining() > 60.0:
            # secondary protocols (one extra bench-scale compile): per-sequence
            # host fetch charges the round-trip to every sequence; the
            # queue-then-fetch pipelining A/B measured 5.7x SLOWER through the
            # axon proxy (async dispatch without intermediate syncs degrades
            # pathologically there)
            fwd = jax.jit(_fwd)
            float(fwd(params, positions, values, mask)[0])
            t0 = time.perf_counter()
            for _ in range(n_loop):
                float(fwd(params, positions, values, mask)[0])
            details["seconds_per_sequence_synced"] = (
                (time.perf_counter() - t0) / n_loop)
            t0 = time.perf_counter()
            sums = [fwd(params, positions, values, mask)[0]
                    for _ in range(n_loop)]
            float(jnp.stack(sums).sum())
            details["seconds_per_sequence_pipelined"] = (
                (time.perf_counter() - t0) / n_loop)

        with open("bench_details.json", "w") as f:
            json.dump(details, f, indent=2)

    finally:
        # disarm on ANY exit: a still-armed timer would os._exit a
        # host process that outlives the bench (the pytest smoke test)
        watchdog.cancel()

if __name__ == "__main__":
    main()
