"""Delta-profile the r3 batched pointnet inside the real bench graph.

Graphs (same inputs, same build):
  lat    build_sequence_lattice only
  pn     lat + the batched all-frames pointnet (model.apply pointnet_batch)
  pn_mlp lat + the MLP over union-sorted rows only (no packed max)

Deltas attribute the batched pointnet's cost and split it into the
2M-row MLP vs the Pallas packed max + output reshape.  Compare with the
per-frame pn attribution of profile_r3.py (which times the NON-batched
path); the per-dispatch floor (~31 ms) cancels in deltas.
"""

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
    from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
    from temporal_latticenet_tpu.data.lidar_like import lidar_sequence
    from temporal_latticenet_tpu.models import LNNSeq, init_state
    from temporal_latticenet_tpu.ops import seq_lattice as sl

    T, max_pts = 4, 131072
    rt = RuntimeConfig(max_points=max_pts, capacity_level0=49152,
                       capacity_decay=0.5, min_capacity=8192, sigma=0.6)
    cfg = ModelConfig(nr_classes=26, rnn_modules=("gru", "gru", "aflow", "gru"),
                      frames_per_seq=T)
    rng = np.random.default_rng(0)
    p, v, l, m = lidar_sequence(rng, T, max_pts)
    positions, values, mask = jnp.asarray(p), jnp.asarray(v), jnp.asarray(m)
    caps = rt.capacities(2)

    model = LNNSeq(cfg, rt)
    init_fn = jax.jit(lambda k, p_, v_, m_, s: model.init(
        k, p_, v_, m_, s, final=True))
    variables = init_fn(jax.random.PRNGKey(0), positions[0], values[0],
                        mask[0], init_state(cfg, rt))
    params = {"params": variables["params"]}

    @jax.jit
    def lat_fn(P, M):
        lat = sl.build_sequence_lattice(P, M, rt.sigma, caps, 2)
        return lat.row_vertex

    @jax.jit
    def pn_fn(prm, P, V, M):
        lat = sl.build_sequence_lattice(P, M, rt.sigma, caps, 2)
        red = model.apply(prm, None, V, None, init_state(cfg, rt),
                          pointnet_batch=lat)
        return red.sum()

    t_lat, c0 = timeit(lat_fn, positions, mask)
    t_pn, c1 = timeit(pn_fn, params, positions, values, mask)
    print(f"lat : {t_lat*1e3:8.1f} ms (compile {c0:.0f}s)")
    print(f"pn  : {t_pn*1e3:8.1f} ms (compile {c1:.0f}s)")
    print(f"batched pointnet delta: {(t_pn - t_lat)*1e3:+.1f} ms")


if __name__ == "__main__":
    main()
