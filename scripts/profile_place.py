"""A/B TLN_PLACE_MODE sort vs scatter on the real nbr-stage graph (TPU).

The two placement sites are the nbr inverse-edge scatter (~nr*4 rows per
level) and the mean-mode table scatter (T*cap rows); XLA scatters cost
~30 ns per source row while sort passes move ~2-3 ns/row/operand, so the
two-sort placement should win ~7-9 ms at bench scale.
"""

import os
import sys
import time

sys.path.insert(0, ".")

mode = sys.argv[1] if len(sys.argv) > 1 else "sort"
os.environ["TLN_PLACE_MODE"] = mode

import numpy as np
import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()


def timeit(fn, *args, iters=6):
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

    def s_nbr(lat):
        out = lat.row_vertex.sum().astype(jnp.float32)
        spn = lat.sorted_pn
        out = (out + spn.rel.sum() + spn.so.sum().astype(jnp.float32)
               + spn.live.sum() + spn.head_vf.sum()
               + spn.bucket.sum().astype(jnp.float32)
               + spn.tailpos.sum().astype(jnp.float32)
               + lat.nr_points.sum() + lat.row_bary.sum())
        for lv in lat.levels:
            out = (out + lv.keys.sum().astype(jnp.float32)
                   + lv.birth.sum().astype(jnp.float32)
                   + lv.nbr_idx.sum().astype(jnp.float32)
                   + lv.nbr_found.sum()
                   + lv.nbr_birth.sum().astype(jnp.float32))
        for lk in lat.links:
            for leaf in jax.tree_util.tree_leaves(lk):
                out = out + leaf.sum().astype(jnp.float32)
        return out

    fn = jax.jit(lambda P, M: s_nbr(
        sl.build_sequence_lattice(P, M, rt.sigma, caps, 2)))
    t, c = timeit(fn, positions, mask)
    print(f"place_mode={mode}: {t*1e3:8.1f} ms (compile {c:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
