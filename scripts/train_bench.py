"""Training-step throughput at SemanticKITTI scale (forward + BPTT backward
+ AdamW update for a full sequence; --frames for longer windows)."""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=120_000)
    ap.add_argument("--capacity", type=int, default=0,
                    help="level-0 capacity; 0 = per-generator default")
    ap.add_argument("--generator", choices=("lidar", "synthetic"),
                    default="lidar")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--frames", type=int, default=4,
                    help="sequence length (frames_per_seq); longer windows "
                    "need --capacity/--trim-capacity/--final-capacity sized "
                    "to the deeper union (scripts/occupancy.py)")
    ap.add_argument("--remat", choices=("full", "selective", "none"),
                    default="selective",
                    help="BPTT remat mode (engine.make_sequence_forward). "
                         "A/B on the real chip at this scale (r5, sort-only "
                         "Lovasz + flat sym-gather backward, amortised/"
                         "synced): none 0.315/0.350 s/step, selective "
                         "0.335/0.378. At frames=8 only FULL fits the "
                         "15.75 GB HBM (none wants 23.1 GB, selective "
                         "24.5); selective stays the default as the "
                         "middle ground, use --remat none for frames<=4 "
                         "peak throughput")
    ap.add_argument("--trim-capacity", type=int, default=-1,
                    help="trimmed-frame level-0 capacity (frames 0..T-2 of "
                    "the BPTT scan run on row prefixes, forward AND "
                    "backward; RuntimeConfig.trim_capacity_level0). -1 = "
                    "per-generator default (lidar: 36864, matching "
                    "bench.py); 0 disables")
    ap.add_argument("--final-capacity", type=int, default=-1,
                    help="FINAL-frame level-0 capacity "
                    "(RuntimeConfig.final_capacity_level0). -1 = "
                    "per-generator default (lidar: 40960, matching "
                    "bench.py); 0 disables")
    args = ap.parse_args()

    from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
    from temporal_latticenet_tpu.data.lidar_like import lidar_sequence
    from temporal_latticenet_tpu.data.synthetic import synthetic_sequence
    from temporal_latticenet_tpu.train import engine

    args.capacity = args.capacity or (49152 if args.generator == "lidar"
                                      else 98304)
    trim = (args.trim_capacity if args.trim_capacity >= 0
            else (36864 if args.generator == "lidar" else 0))
    ftrim = (args.final_capacity if args.final_capacity >= 0
             else (40960 if args.generator == "lidar" else 0))

    rt = RuntimeConfig(max_points=131072, capacity_level0=args.capacity,
                       capacity_decay=0.5, min_capacity=8192, sigma=0.6,
                       remat_mode=args.remat,
                       trim_capacity_level0=trim,
                       final_capacity_level0=ftrim)
    cfg = ModelConfig(nr_classes=26, rnn_modules=("gru", "gru", "aflow", "gru"),
                      frames_per_seq=args.frames)

    model, state, tx = engine.create_train_state(cfg, rt, 1e-3, 1e-3)
    train_step, _ = engine.make_train_step(model, cfg, rt, tx)

    rng = np.random.default_rng(0)
    if args.generator == "lidar":
        p, v, l, m = lidar_sequence(rng, args.frames, rt.max_points)
    else:
        p, v, l, m = synthetic_sequence(rng, args.frames, args.points,
                                        rt.max_points)
    batch = engine.SeqBatch(jnp.asarray(p)[None], jnp.asarray(v)[None],
                            jnp.asarray(l)[None], jnp.asarray(m)[None])

    t0 = time.perf_counter()
    state, logp, metrics = train_step(state, batch, 1.0)
    loss = float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    print(f"compile+first step: {compile_s:.1f}s loss={loss:.4f}", flush=True)

    ts = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state, logp, metrics = train_step(state, batch, 1.0)
        float(metrics["loss"])
        ts.append(time.perf_counter() - t0)
    dt_synced = min(ts)

    # headline protocol (same rationale as bench.py): n optimizer steps
    # inside ONE jitted loop, so the ~31 ms tunnel dispatch tax (a dev-rig
    # artifact; a production host dispatches in ~0.1 ms) is amortised.
    # The carried TrainState changes every iteration (real AdamW updates),
    # so nothing is hoistable; the final loss is threaded out and fetched.
    n_loop = args.iters

    @jax.jit
    def steps_loop(st, b, n):
        def body(i, carry):
            st, _ = carry
            st2, _, mets = train_step(st, b, 1.0)
            return (st2, mets["loss"])
        return jax.lax.fori_loop(0, n, body, (st, jnp.float32(0.0)))

    (state, last_loss) = steps_loop(state, batch, jnp.int32(1))
    float(last_loss)  # compile + warm
    t0 = time.perf_counter()
    (state, last_loss) = steps_loop(state, batch, jnp.int32(n_loop))
    float(last_loss)
    dt = (time.perf_counter() - t0) / n_loop

    print(json.dumps({
        "metric": f"semantickitti_{args.frames}frame_train_step",
        "value": round(args.frames * args.points / dt, 1),
        "unit": "points/sec/chip",
        "seconds_per_step": dt,
        "seconds_per_step_synced": dt_synced,
        "timing_protocol": "on-device fori_loop over iters (one dispatch, "
                           "amortised); synced = one host round-trip per "
                           "step (~31 ms tunnel tax each)",
        "compile_seconds": compile_s,
        "remat": args.remat,
        "trim_capacity": trim,
        "final_capacity": ftrim,
        "vertex_overflow": bool(metrics.get("vertex_overflow", False)),
    }), flush=True)


if __name__ == "__main__":
    main()
