"""Sub-split the batched-pointnet gather+MLP delta (profile_pn_split.py).

Graphs (all include the lattice build; deltas vs `lat` attribute cost):
  gchain  lat + repeat/concat/[so]-gather/live-mul/rel-concat/bf16 cast
  mlpsyn  lat + 3 narrow bf16 matmuls on a synthetic (Q,7) made from rel
          (no vals gather) -- isolates the MLP itself
  scansyn lat + pack + blocked cumsum + Pallas u32 max-scan + tail gather
          on a synthetic (Q,64) bf16 (no MLP, no vals gather)
  gmlp    lat + gather chain + MLP (== profile_pn_split.py's gmlp)

If gchain+mlpsyn deltas ~ gmlp delta the stages are additive; whichever
dominates is the fusion target.
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
    from temporal_latticenet_tpu.config import RuntimeConfig
    from temporal_latticenet_tpu.data.lidar_like import lidar_sequence
    from temporal_latticenet_tpu.ops import seq_lattice as sl
    from temporal_latticenet_tpu.ops import segment as seg

    T, max_pts = 4, 131072
    rt = RuntimeConfig(max_points=max_pts, capacity_level0=49152,
                       capacity_decay=0.5, min_capacity=8192, sigma=0.6)
    rng = np.random.default_rng(0)
    p, v, l, m = lidar_sequence(rng, T, max_pts)
    positions, values, mask = jnp.asarray(p), jnp.asarray(v), jnp.asarray(m)
    caps = rt.capacities(2)

    ks = [jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
          for s in [(7, 16), (16, 32), (32, 64)]]
    bs = [jnp.zeros((s,), jnp.float32) for s in (16, 32, 64)]

    def build(P, M):
        return sl.build_sequence_lattice(P, M, rt.sigma, caps, 2)

    def gather_chain(lat, V):
        spn = lat.sorted_pn
        t, p_, v_ = V.shape
        vals_flat = jnp.repeat(V.reshape(t * p_, v_), 4, axis=0)
        bary_flat = lat.row_bary.reshape(-1)
        vb = jnp.concatenate([vals_flat, bary_flat[:, None]], 1)[spn.so]
        vals_s = vb[:, :v_] * spn.live[:, None]
        bary_s = vb[:, v_]
        x = jnp.concatenate([spn.rel, vals_s], -1).astype(jnp.bfloat16)
        return x, bary_s

    def run_mlp(x):
        for k, b in zip(ks, bs):
            x = (jnp.dot(x, k.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) + b
                 ).astype(jnp.bfloat16)
            if k is not ks[-1]:
                x = jax.nn.relu(x)
        return x

    @jax.jit
    def lat_fn(P, M):
        return build(P, M).row_vertex

    @jax.jit
    def gchain(P, M, V):
        lat = build(P, M)
        x, bary_s = gather_chain(lat, V)
        return x.astype(jnp.float32).sum() + bary_s.sum()

    @jax.jit
    def mlpsyn(P, M, V):
        lat = build(P, M)
        spn = lat.sorted_pn
        x = jnp.concatenate([spn.rel, spn.rel, spn.rel[:, :1]], -1
                            ).astype(jnp.bfloat16)
        return run_mlp(x).astype(jnp.float32).sum()

    @jax.jit
    def scansyn(P, M, V):
        lat = build(P, M)
        spn = lat.sorted_pn
        x = (spn.rel[:, :1] * jnp.full((1, 64), 0.5, jnp.float32)
             ).astype(jnp.bfloat16)
        bary_s = spn.rel[:, 1]
        mx, bary_sel = seg.sorted_packed_max(
            x, bary_s, spn.live, spn.head_vf, spn.bucket, spn.tailpos,
            lat.nr_points > 0)
        return mx.sum() + bary_sel.sum()

    @jax.jit
    def gmlp(P, M, V):
        lat = build(P, M)
        x, bary_s = gather_chain(lat, V)
        return run_mlp(x).astype(jnp.float32).sum() + bary_s.sum()

    t0, c0 = timeit(lat_fn, positions, mask)
    print(f"lat    : {t0*1e3:8.1f} ms (compile {c0:.0f}s)", flush=True)
    for name, fn in [("gchain", gchain), ("mlpsyn", mlpsyn),
                     ("scansyn", scansyn), ("gmlp", gmlp)]:
        t, c = timeit(fn, positions, mask, values)
        print(f"{name:7s}: {t*1e3:8.1f} ms (+{(t-t0)*1e3:.1f}) "
              f"(compile {c:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
