"""Online (streaming) per-frame inference latency: the serving path.

The offline bench (bench.py) processes a whole 4-frame sequence in one
program via the birth-tagged lattice build; a deployed system instead sees
one scan at a time and carries lattice+hidden state (the reference's
per-frame ``model(lattice, positions, values, early_return)`` --
train_ln.py:163-175).  This measures that path's per-frame latency with
real host round-trips: trimmed frames (state update only) and the final
frame (full logits).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=49152)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--streams", type=int, default=1,
                    help="concurrent serving streams (DP over the mesh when "
                    ">1 device is visible, else batched on one chip)")
    args = ap.parse_args()

    from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
    from temporal_latticenet_tpu.data.lidar_like import lidar_sequence
    from temporal_latticenet_tpu.models import LNNSeq, init_state
    from temporal_latticenet_tpu.train.engine import (
        make_streaming_inference, make_streaming_inference_incremental)

    rt = RuntimeConfig(max_points=131072, capacity_level0=args.capacity,
                       capacity_decay=0.5, min_capacity=8192, sigma=0.6)
    cfg = ModelConfig(nr_classes=26,
                      rnn_modules=("gru", "gru", "aflow", "gru"),
                      frames_per_seq=4)
    model = LNNSeq(cfg, rt)

    rng = np.random.default_rng(0)
    p, v, l, m = lidar_sequence(rng, 4, rt.max_points)
    P, V, M = jnp.asarray(p), jnp.asarray(v), jnp.asarray(m)
    pts = int(m.sum(1).mean())

    init_fn = jax.jit(lambda k: model.init(
        k, P[0], V[0], M[0], init_state(cfg, rt), final=True))
    params = {"params": init_fn(jax.random.PRNGKey(0))["params"]}

    new_state_fn, step_fn, final_fn = make_streaming_inference(model, cfg, rt)

    def run_seq():
        s = new_state_fn()
        for t in range(3):
            s = step_fn(params, P[t], V[t], M[t], s)
        logp, sv, s, aux = final_fn(params, P[3], V[3], M[3], s)
        return float(logp.sum())

    t0 = time.perf_counter()
    run_seq()
    compile_s = time.perf_counter() - t0
    run_seq()

    # per-frame latencies
    trim_ts, final_ts = [], []
    for _ in range(args.iters):
        s = new_state_fn()
        float(s.h[0].sum())
        for t in range(3):
            t0 = time.perf_counter()
            s = step_fn(params, P[t], V[t], M[t], s)
            # force a host fetch THROUGH the compute (block_until_ready can
            # lie through the tunnel)
            float(s.h[0].sum())
            trim_ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        logp, sv, s, aux = final_fn(params, P[3], V[3], M[3], s)
        float(logp.sum())
        final_ts.append(time.perf_counter() - t0)

    trim_ms = float(np.median(trim_ts) * 1e3)
    final_ms = float(np.median(final_ts) * 1e3)

    # ---- incremental serving path --------------------------------------
    new_fn, istep_full, istep, ifinal = \
        make_streaming_inference_incremental(model, cfg, rt, max_new=8192)

    def run_inc():
        s, fs = new_fn()
        s, fs = istep_full(params, P[0], V[0], M[0], s, fs)
        for t in range(1, 3):
            s, fs = istep(params, P[t], V[t], M[t], s, fs)
        logp, sv, s, fs, aux = ifinal(params, P[3], V[3], M[3], s, fs)
        return float(logp.sum())

    t0 = time.perf_counter()
    run_inc()
    inc_compile_s = time.perf_counter() - t0
    run_inc()

    itrim, ifin = [], []
    for _ in range(args.iters):
        s, fs = new_fn()
        float(s.h[0].sum())
        s, fs = istep_full(params, P[0], V[0], M[0], s, fs)
        float(s.h[0].sum())
        for t in range(1, 3):
            t0 = time.perf_counter()
            s, fs = istep(params, P[t], V[t], M[t], s, fs)
            float(s.h[0].sum())
            itrim.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        logp, sv, s, fs, aux = ifinal(params, P[3], V[3], M[3], s, fs)
        float(logp.sum())
        ifin.append(time.perf_counter() - t0)

    # ---- multi-stream serving DP (--streams N) -------------------------
    streams = {}
    if args.streams > 1:
        from temporal_latticenet_tpu.parallel.mesh import make_mesh, replicate
        from temporal_latticenet_tpu.train.engine import (
            make_streaming_inference_batched)
        n_dev = len(jax.devices())
        mesh = make_mesh() if (n_dev > 1 and args.streams % n_dev == 0) \
            else None
        new_b, step_b, final_b = make_streaming_inference_batched(
            model, cfg, rt, mesh=mesh)
        if mesh is not None:
            params_b = replicate(mesh, params)
        else:
            params_b = params
        B = args.streams
        PB = jnp.broadcast_to(P[:, None], (4, B) + P.shape[1:])
        VB = jnp.broadcast_to(V[:, None], (4, B) + V.shape[1:])
        MB = jnp.broadcast_to(M[:, None], (4, B) + M.shape[1:])

        def run_b():
            st = new_b(B)
            for t in range(3):
                st = step_b(params_b, PB[t], VB[t], MB[t], st)
            logp, sv, st, aux = final_b(params_b, PB[3], VB[3], MB[3], st)
            return float(logp.sum())

        t0 = time.perf_counter()
        run_b()
        b_compile = time.perf_counter() - t0
        run_b()
        bt, bf = [], []
        for _ in range(args.iters):
            st = new_b(B)
            float(st.h[0].sum())
            for t in range(3):
                t0 = time.perf_counter()
                st = step_b(params_b, PB[t], VB[t], MB[t], st)
                float(st.h[0].sum())
                bt.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            logp, _, st, _ = final_b(params_b, PB[3], VB[3], MB[3], st)
            float(logp.sum())
            bf.append(time.perf_counter() - t0)
        streams = {
            "streams": B,
            "mesh_devices": 1 if mesh is None else n_dev,
            "streams_trimmed_frame_ms": round(float(np.median(bt) * 1e3), 1),
            "streams_final_frame_ms": round(float(np.median(bf) * 1e3), 1),
            "streams_compile_seconds": round(b_compile, 1),
        }

    out = {
        "metric": "streaming_per_frame_latency",
        **streams,
        "trimmed_frame_ms": round(trim_ms, 1),
        "final_frame_ms": round(final_ms, 1),
        "incremental_trimmed_frame_ms": round(float(np.median(itrim) * 1e3), 1),
        "incremental_final_frame_ms": round(float(np.median(ifin) * 1e3), 1),
        "points_per_frame": pts,
        "compile_seconds": round(compile_s, 1),
        "incremental_compile_seconds": round(inc_compile_s, 1),
        "note": "per-dispatch host round-trip ~31 ms is included in each",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
