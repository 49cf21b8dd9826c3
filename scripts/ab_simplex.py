"""A/B the fused Pallas simplex/pack kernel on the real TPU.

Validates bit-exactness of build_sequence_lattice with
TLN_PALLAS_SIMPLEX on vs off (row_vertex / counts / bary / rel), then
times both whole graphs (delta = the kernel's saving; absolute numbers
include the ~31 ms dispatch floor once).

Usage: python -u scripts/ab_simplex.py [--frames 4] [--capacity 49152]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

os.environ.setdefault("TLN_PALLAS_SIMPLEX", "1")

import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()


def timeit(fn, *args, iters=5):
    t0 = time.perf_counter()
    float(jax.tree_util.tree_leaves(fn(*args))[0].sum())
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jax.tree_util.tree_leaves(fn(*args))[0].sum())
        ts.append(time.perf_counter() - t0)
    return min(ts), compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--capacity", type=int, default=49152)
    args = ap.parse_args()

    from temporal_latticenet_tpu.config import RuntimeConfig
    from temporal_latticenet_tpu.data.lidar_like import lidar_sequence
    from temporal_latticenet_tpu.ops import seq_lattice as sl

    max_pts = 131072
    rt = RuntimeConfig(max_points=max_pts, capacity_level0=args.capacity,
                       capacity_decay=0.5, min_capacity=8192, sigma=0.6)
    caps = rt.capacities(2)
    rng = np.random.default_rng(0)
    p, v, l, m = lidar_sequence(rng, args.frames, max_pts)
    P, M = jnp.asarray(p), jnp.asarray(m)

    def build(P_, M_):
        lat = sl.build_sequence_lattice(P_, M_, rt.sigma, caps, 2)
        return (lat.row_vertex, lat.row_bary, lat.row_rel_pos,
                lat.levels[0].counts, lat.levels[0].birth,
                lat.levels[1].counts, lat.levels[2].counts)

    sl_mod = sl

    # off
    os.environ["TLN_PALLAS_SIMPLEX"] = "0"
    f_off = jax.jit(build)
    out_off = jax.tree_util.tree_map(np.asarray, f_off(P, M))
    t_off, c_off = timeit(f_off, P, M)
    print(f"off: {t_off*1e3:8.1f} ms (compile {c_off:.0f}s)", flush=True)

    # on (fresh jit cache via new closure)
    os.environ["TLN_PALLAS_SIMPLEX"] = "1"
    f_on = jax.jit(lambda P_, M_: build(P_, M_))
    out_on = jax.tree_util.tree_map(np.asarray, f_on(P, M))
    t_on, c_on = timeit(f_on, P, M)
    print(f"on : {t_on*1e3:8.1f} ms (compile {c_on:.0f}s)", flush=True)

    names = ["row_vertex", "row_bary", "row_rel_pos", "counts0", "birth0",
             "counts1", "counts2"]
    ok = True
    for name, a, b in zip(names, out_off, out_on):
        if a.dtype.kind == "f":
            same = np.allclose(a, b, atol=2e-6)
            md = np.abs(a - b).max()
            print(f"  {name}: allclose={same} maxdiff={md:.2e}")
        else:
            same = np.array_equal(a, b)
            print(f"  {name}: equal={same}"
                  + ("" if same else f" ndiff={(a != b).sum()}"))
        ok &= bool(same)
    print(f"\nverdict: {'OK' if ok else 'MISMATCH'}; "
          f"delta {1e3*(t_off - t_on):+.1f} ms", flush=True)


if __name__ == "__main__":
    main()
