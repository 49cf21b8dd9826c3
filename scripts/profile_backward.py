"""Backward (BPTT) cost attribution by stop-gradient cuts.

The inference netsplit (profile_netsplit.py) attributed the FORWARD by
early-return cuts; this is its backward analog.  Each variant inserts
``jax.lax.stop_gradient`` at a named cut point (models/lnn_seq.py ``_sg``,
engine carry cut), which lets XLA dead-code-eliminate every backward
segment upstream of the cut while the forward (and the optimizer update,
grad-norm, metrics fetch) stay IDENTICAL across variants.  Successive
deltas therefore attribute backward cost per network segment:

  fwd+loss        forward + loss on the train path (fold_in rng, dropout
                  on), NO grad/optimizer -- the pre-backward floor
  carry+logits    fwd + loss backward + optimizer (the floor)
  carry+slice_in  + DeformSlice head backward (slice gather transpose)
  carry+late      + final-frame up-resnets backward
  carry+upcut     + final-frame up path (finefy x2, concat, late fusion)
  carry+pn        + final-frame down path/coarsens/bottleneck/fusions
  carry           + pointnet backward (MLP transpose + packed-max routing)
  none            + the T-1 trimmed frames' backward (the BPTT scan)

Run on the real TPU (NOT concurrently with anything else):
  python -u scripts/profile_backward.py [--iters 4]
Each variant recompiles (~3-6 min at bench scale); ~40 min total.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

VARIANTS = [
    # (label, TLN_PROFILE_SG, carry_cut)
    # fwd+loss: NO value_and_grad / optimizer at all -- engine's loss_step,
    # the SAME stochastic batch_loss path as train_step (fold_in rng,
    # dropout on), so the carry+logits - fwd+loss delta prices exactly the
    # grad machinery + AdamW floor.  Against the synced inference number
    # (bench_details seconds_per_sequence_synced) it prices the loss.
    # carry flag is meaningless here (no backward to cut).
    ("fwd+loss", "fwdonly", False),
    ("carry+logits", "logits", True),
    ("carry+slice_in", "slice_in", True),
    ("carry+late", "late", True),
    ("carry+upcut", "upcut", True),
    ("carry+pn", "pn", True),
    ("carry", "", True),
    ("none", "", False),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--cap", type=int, default=49152,
                    help="capacity_level0; trim/final caps scale with it")
    ap.add_argument("--remat", choices=("full", "selective", "none"),
                    default="none",
                    help="'none' attributes the raw backward; selective/full"
                    " fold recompute into the trimmed-frame delta")
    ap.add_argument("--only", default="",
                    help="comma-separated variant labels to run")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (plumbing smoke test)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
    from temporal_latticenet_tpu.data.lidar_like import lidar_sequence
    from temporal_latticenet_tpu.train import engine

    cap = args.cap
    rt = RuntimeConfig(max_points=args.points, capacity_level0=cap,
                       capacity_decay=0.5,
                       min_capacity=min(8192, cap // 4),
                       sigma=0.6, remat_mode=args.remat,
                       trim_capacity_level0=cap * 3 // 4,
                       final_capacity_level0=cap * 5 // 6)
    cfg = ModelConfig(nr_classes=26,
                      rnn_modules=("gru", "gru", "aflow", "gru"),
                      frames_per_seq=4)

    model, state0, tx = engine.create_train_state(cfg, rt, 1e-3, 1e-3)

    rng = np.random.default_rng(0)
    p, v, l, m = lidar_sequence(rng, 4, rt.max_points)
    batch = engine.SeqBatch(jnp.asarray(p)[None], jnp.asarray(v)[None],
                            jnp.asarray(l)[None], jnp.asarray(m)[None])

    wanted = set(args.only.split(",")) if args.only else None
    results = []
    for label, sg, carry in VARIANTS:
        if wanted and label not in wanted:
            continue
        if sg == "fwdonly":
            os.environ.pop("TLN_PROFILE_SG", None)
            os.environ["TLN_PROFILE_SG_CARRY"] = "0"
            _ts, _ = engine.make_train_step(model, cfg, rt, tx)

            def train_step(st, b, _lr, _loss=_ts.loss_step):
                logp, m = _loss(st.params, b, st.step)
                m = dict(m, grad_norm=jnp.float32(0.0))
                return st, logp, m
        else:
            os.environ["TLN_PROFILE_SG"] = sg
            os.environ["TLN_PROFILE_SG_CARRY"] = "1" if carry else "0"
            # fresh trace per variant: the env gates are read at trace time
            train_step, _ = engine.make_train_step(model, cfg, rt, tx)
        t0 = time.perf_counter()
        st, _, metrics = train_step(state0, batch, 1.0)
        loss = float(metrics["loss"])
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            st, _, metrics = train_step(st, batch, 1.0)
            float(metrics["loss"])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        gn = float(metrics["grad_norm"])
        row = {"variant": label, "seconds_per_step": round(dt, 4),
               "compile_s": round(compile_s, 1), "loss": round(loss, 4),
               "grad_norm": round(gn, 4)}
        results.append(row)
        print(json.dumps(row), flush=True)

    os.environ.pop("TLN_PROFILE_SG", None)
    os.environ.pop("TLN_PROFILE_SG_CARRY", None)
    if len(results) > 1:
        print("\n--- deltas (each segment's backward cost) ---", flush=True)
        for a, b in zip(results, results[1:]):
            d = b["seconds_per_step"] - a["seconds_per_step"]
            print(f"{b['variant']:>16} - {a['variant']:<16} = {d*1e3:+8.1f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
