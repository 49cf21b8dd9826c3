"""Measure the in-graph cost of the union mean's Q-row table gather.

table_compact builds the (T*cap+1, 5) mean table from compacted tails and
then every one of the Q=2M rows gathers its total back (`tot = buf[bucket]`,
ops/seq_lattice.py).  The micro gather number (~21 ms) may overstate the
in-graph cost because XLA can overlap it; TLN_PROFILE_SKIP_MEAN_GATHER=1
replaces the gather with a broadcast constant (wrong results, same
everything-else) so the delta is the gather's real cost on the spn graph.
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()


def timeit(fn, *args, iters=5):
    t0 = time.perf_counter()
    float(fn(*args))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), c


def main():
    from temporal_latticenet_tpu.config import RuntimeConfig
    from temporal_latticenet_tpu.data.lidar_like import lidar_sequence
    from temporal_latticenet_tpu.ops import seq_lattice as sl

    T, max_pts = 4, 131072
    rt = RuntimeConfig(max_points=max_pts, capacity_level0=49152,
                       capacity_decay=0.5, min_capacity=8192, sigma=0.6)
    rng = np.random.default_rng(0)
    p, v, l, m = lidar_sequence(rng, T, max_pts)
    positions, mask = jnp.asarray(p), jnp.asarray(m)
    caps = rt.capacities(2)

    def s_spn(lat):
        spn = lat.sorted_pn
        return (lat.row_vertex.sum().astype(jnp.float32) + spn.rel.sum()
                + spn.so.sum().astype(jnp.float32) + spn.live.sum()
                + spn.head_vf.sum() + spn.bucket.sum().astype(jnp.float32)
                + spn.tailpos.sum().astype(jnp.float32)
                + lat.nr_points.sum())

    for skip in ("0", "1"):
        os.environ["TLN_PROFILE_SKIP_MEAN_GATHER"] = skip
        fn = jax.jit(lambda P, M: s_spn(
            sl.build_sequence_lattice(P, M, rt.sigma, caps, 2)))
        t, c = timeit(fn, positions, mask)
        print(f"skip_gather={skip}: {t*1e3:8.1f} ms (compile {c:.0f}s)",
              flush=True)
    os.environ["TLN_PROFILE_SKIP_MEAN_GATHER"] = "0"


if __name__ == "__main__":
    main()
