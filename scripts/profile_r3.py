"""Round-3 stage split of the REAL bench forward at current settings.

Uses the early_return cut machinery (models/lnn_seq.py) to time nested
prefixes of the actual flagship forward -- every graph builds the same
whole-sequence lattice, runs 4 frames, and cuts at a different site, so
deltas attribute time to real network stages (params, GN, fusion included),
unlike the synthetic kernels of profile_r2.py.

  lat      build_sequence_lattice only
  pn       + 4x (pointnet + early fusion)           rnn gru,none,none,none
  down0    + 4x (level-0 blocks + middle fusion)    rnn gru,gru,none,none
  mid      + 4x (coarsens, level-1 blocks, bottleneck + fusion)
                                                    rnn gru,gru,gru*,none
  up       + 4x (finefy/up path + late aflow)       flagship, all non-final
  full     + 1x (up-resnets + slice + logsoftmax)   the bench graph

(*site 2 is the bottleneck gru in the flagship too; site ordering follows
SITES in lnn_seq.py.)
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()


def timeit(fn, *args, iters=4):
    t0 = time.perf_counter()
    float(jax.tree_util.tree_leaves(fn(*args))[0].sum())
    c = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jax.tree_util.tree_leaves(fn(*args))[0].sum())
        ts.append(time.perf_counter() - t0)
    return min(ts), c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=49152)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--stages", default="lat,pn,down0,mid,up,full",
                    help="comma list to run (each compiles minutes cold)")
    args = ap.parse_args()

    from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
    from temporal_latticenet_tpu.data.lidar_like import lidar_sequence
    from temporal_latticenet_tpu.models import LNNSeq, init_state
    from temporal_latticenet_tpu.ops import seq_lattice as sl
    from temporal_latticenet_tpu.train.engine import make_sequence_forward

    T = args.frames
    max_pts = 131072
    rt = RuntimeConfig(max_points=max_pts, capacity_level0=args.capacity,
                       capacity_decay=0.5, min_capacity=8192, sigma=0.6)
    rng = np.random.default_rng(0)
    p, v, l, m = lidar_sequence(rng, T, max_pts)
    positions, values, mask = jnp.asarray(p), jnp.asarray(v), jnp.asarray(m)
    caps = rt.capacities(2)

    def cfg_for(rnns):
        return ModelConfig(nr_classes=26, rnn_modules=rnns, frames_per_seq=T)

    FLAG = ("gru", "gru", "aflow", "gru")

    @jax.jit
    def lat_fn(P, M):
        lat = sl.build_sequence_lattice(P, M, rt.sigma, caps, 2)
        return lat.row_vertex

    def make_nonfinal(rnns):
        """4 non-final frames: each cuts at the last active fusion site."""
        cfg = cfg_for(rnns)
        model = LNNSeq(cfg, rt)
        init_fn = jax.jit(lambda k, p_, v_, m_, s: model.init(
            k, p_, v_, m_, s, final=True))
        variables = init_fn(jax.random.PRNGKey(0), positions[0], values[0],
                            mask[0], init_state(cfg, rt))
        params = {"params": variables["params"]}

        def fwd(prm, P, V, M):
            lat = sl.build_sequence_lattice(P, M, rt.sigma, caps, 2)
            state = init_state(cfg, rt)
            out = jnp.float32(0.0)
            for t in range(T):
                dist = sl_frame_dist(lat, t)
                _, state, aux = model.apply(prm, P[t], V[t], M[t], state,
                                            final=False, pre=(lat, dist))
                out = out + state.h[_last_site(rnns)].sum()
            return out
        return jax.jit(fwd), params

    def _last_site(rnns):
        last = 0
        for i, k in enumerate(rnns):
            if k != "none":
                last = i
        return last

    from temporal_latticenet_tpu.train import engine

    def sl_frame_dist(lat, t):
        from temporal_latticenet_tpu.ops.lattice_ops import DistributeOut
        return DistributeOut(
            row_vertex=lat.row_vertex[t], row_bary=lat.row_bary[t],
            row_valid=lat.row_valid[t], row_rel_pos=lat.row_rel_pos[t],
            point_vertex=lat.point_vertex[t], point_bary=lat.point_bary[t])

    # full bench graph
    cfgF = cfg_for(FLAG)
    modelF = LNNSeq(cfgF, rt)
    seq_fwd = make_sequence_forward(modelF, cfgF, rt)
    init_fn = jax.jit(lambda k, p_, v_, m_, s: modelF.init(
        k, p_, v_, m_, s, final=True))
    variables = init_fn(jax.random.PRNGKey(0), positions[0], values[0],
                        mask[0], init_state(cfgF, rt))
    paramsF = {"params": variables["params"]}

    @jax.jit
    def full_fn(prm, P, V, M):
        logp, sv, aux = seq_fwd(prm, P, V, M)
        return logp.sum()

    stages = {}
    wanted = args.stages.split(",")
    if "lat" in wanted:
        t, c = timeit(lat_fn, positions, mask)
        stages["lat"] = t
        print(f"lat   : {t*1e3:8.1f} ms (compile {c:.0f}s)", flush=True)
    for name, rnns in [("pn", ("gru", "none", "none", "none")),
                       ("down0", ("gru", "gru", "none", "none")),
                       ("mid", ("gru", "gru", "gru", "none")),
                       ("up", FLAG)]:
        if name not in wanted:
            continue
        fn, prm = make_nonfinal(rnns)
        t, c = timeit(fn, prm, positions, values, mask)
        stages[name] = t
        print(f"{name:6s}: {t*1e3:8.1f} ms (compile {c:.0f}s)", flush=True)
    if "full" in wanted:
        t, c = timeit(full_fn, paramsF, positions, values, mask)
        stages["full"] = t
        print(f"full  : {t*1e3:8.1f} ms (compile {c:.0f}s)", flush=True)

    print("\nDeltas (cumulative-prefix attribution):")
    order = [s for s in ["lat", "pn", "down0", "mid", "up", "full"]
             if s in stages]
    prev = 0.0
    for name in order:
        print(f"  {name:6s}: +{(stages[name]-prev)*1e3:7.1f} ms")
        prev = stages[name]


if __name__ == "__main__":
    main()
