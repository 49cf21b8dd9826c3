"""Stage-by-stage TPU timing: which parts of the frame pipeline dominate.

Times (with real host round-trips) the isolated jitted stages at bench
scale: distribute+union, neighbor-table build, lattice convs at each width,
segment reductions, and the full sequence forward.  Guides Pallas kernel
priorities.

Usage: python scripts/profile_stages.py [--points 120000] [--capacity 65536]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp


def timeit(fn, *args, iters=5, warmup=2):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    _ = float(jax.tree_util.tree_leaves(fn(*args))[0].sum())
    compile_like = time.perf_counter() - t0
    for _ in range(warmup):
        jax.tree_util.tree_leaves(fn(*args))[0].sum().block_until_ready()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jax.tree_util.tree_leaves(fn(*args))[0].sum())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=120_000)
    ap.add_argument("--capacity", type=int, default=65_536)
    args = ap.parse_args()

    from temporal_latticenet_tpu.ops import lattice_ops as lo
    from temporal_latticenet_tpu.ops import vertex_table as vt
    from temporal_latticenet_tpu.ops import segment as seg
    from temporal_latticenet_tpu.data.synthetic import synthetic_sequence

    rng = np.random.default_rng(0)
    max_pts = 1 << int(np.ceil(np.log2(args.points)))
    p, v, l, m = synthetic_sequence(rng, 1, args.points, max_pts)
    pos, msk = jnp.asarray(p[0]), jnp.asarray(m[0])
    cap = args.capacity

    t0_table = vt.make_table(cap, 3)

    dist_fn = jax.jit(lambda t, x, mm: lo.distribute(t, x, mm, 0.6))
    t_dist = timeit(lambda: dist_fn(t0_table, pos, msk)[0].keys)
    print(f"distribute+union: {t_dist*1e3:9.2f} ms")

    table, out = dist_fn(t0_table, pos, msk)
    table = jax.tree_util.tree_map(jnp.asarray, table)

    nbr_fn = jax.jit(lo.build_neighbor_table)
    t_nbr = timeit(lambda: nbr_fn(table).idx)
    print(f"neighbor build:   {t_nbr*1e3:9.2f} ms")

    nbr = nbr_fn(table)
    for c in [64, 128, 192, 256]:
        vals = jnp.asarray(rng.normal(size=(cap, c)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(9 * c, c)).astype(np.float32) * 0.01)
        conv_fn = jax.jit(lambda x, ww: lo.lattice_conv(x, nbr, ww, table.count))
        t_conv = timeit(lambda: conv_fn(vals, w))
        print(f"conv 9x{c:3d}->{c:3d}: {t_conv*1e3:9.2f} ms")

    rows = jnp.asarray(rng.normal(size=(max_pts * 4, 64)).astype(np.float32))
    seg_fn = jax.jit(lambda r: seg.segment_max_with_argmax(
        r, out.row_vertex, cap, out.row_valid)[0])
    t_seg = timeit(lambda: seg_fn(rows))
    print(f"segment_max+arg:  {t_seg*1e3:9.2f} ms")

    grow_fn = jax.jit(lambda ft: lo.grow_coarse_table(
        ft, vt.make_table(cap, 3))[0].keys)
    t_grow = timeit(lambda: grow_fn(table))
    print(f"grow_coarse:      {t_grow*1e3:9.2f} ms")

    print(f"occupied vertices: {int(table.count)}")


if __name__ == "__main__":
    main()
