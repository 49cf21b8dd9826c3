"""DCE-aware split of build_sequence_lattice + batched pointnet.

Earlier probes (profile_pn_split/profile_pn_sub) returned only
``lat.row_vertex`` from the "build-only" graph, so XLA dead-code-eliminated
the in-union mean path (rel2/nr_points/tailpos), the head tables and ALL
neighbor tables -- their cost was mis-attributed to whichever downstream
stage first touched them.  Here every graph returns tiny sums of exactly
the fields it is meant to force, cumulatively:

  rv     row_vertex only (the old misleading "lat")
  spn    + sorted_pn fields, nr_points (forces the union mean path)
  dist   + row_bary, point_vertex, point_bary (the slice inputs)
  nbr    + per-level nbr tables, births, counts, links (full build)
  pn     + the real batched pointnet reduce (gather chain + MLP + packed
           max-scan + (T,cap,2C) extraction), real weight shapes (4-ch in)
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
    vdim = v.shape[-1]

    ks = [jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
          for s in [(3 + vdim, 16), (16, 32), (32, 64)]]
    bs = [jnp.zeros((s,), jnp.float32) for s in (16, 32, 64)]

    def build(P, M):
        return sl.build_sequence_lattice(P, M, rt.sigma, caps, 2)

    def s_rv(lat):
        return lat.row_vertex.sum()

    def s_spn(lat):
        spn = lat.sorted_pn
        return (s_rv(lat).astype(jnp.float32) + spn.rel.sum()
                + spn.so.sum().astype(jnp.float32) + spn.live.sum()
                + spn.head_vf.sum() + spn.bucket.sum().astype(jnp.float32)
                + spn.tailpos.sum().astype(jnp.float32)
                + lat.nr_points.sum())

    def s_dist(lat):
        return (s_spn(lat) + lat.row_bary.sum()
                + lat.point_vertex.sum().astype(jnp.float32)
                + lat.point_bary.sum())

    def s_nbr(lat):
        out = s_dist(lat)
        for lv in lat.levels:
            out = (out + lv.keys.sum().astype(jnp.float32)
                   + lv.birth.sum().astype(jnp.float32)
                   + lv.counts.sum().astype(jnp.float32)
                   + lv.nbr_idx.sum().astype(jnp.float32)
                   + lv.nbr_found.sum() + lv.nbr_birth.sum().astype(
                       jnp.float32))
        for lk in lat.links:
            for leaf in jax.tree_util.tree_leaves(lk):
                out = out + leaf.sum().astype(jnp.float32)
        return out

    def reduce_pn(lat, V):
        spn = lat.sorted_pn
        t, p_, v_ = V.shape
        vals_flat = jnp.repeat(V.reshape(t * p_, v_), 4, axis=0)
        bary_flat = lat.row_bary.reshape(-1)
        vb = jnp.concatenate([vals_flat, bary_flat[:, None]], 1)[spn.so]
        vals_s = vb[:, :v_] * spn.live[:, None]
        bary_s = vb[:, v_]
        x = jnp.concatenate([spn.rel, vals_s], -1).astype(jnp.bfloat16)
        for k, b in zip(ks, bs):
            x = (jnp.dot(x, k.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) + b
                 ).astype(jnp.bfloat16)
            if k is not ks[-1]:
                x = jax.nn.relu(x)
        mx, bary_sel = seg.sorted_packed_max(
            x, bary_s, spn.live, spn.head_vf, spn.bucket, spn.tailpos,
            lat.nr_points > 0)
        cap = lat.nr_points.shape[1]
        c = x.shape[-1]
        reduced = jnp.concatenate([mx.reshape(t, cap, c),
                                   bary_sel.reshape(t, cap, c)], axis=-1)
        reduced = jnp.where((lat.nr_points >= 4)[..., None], reduced, 0.0)
        return reduced.sum()

    def pn_graph(P, M, V):
        lat = build(P, M)
        return s_nbr(lat) + reduce_pn(lat, V)

    graphs = {
        "rv": jax.jit(lambda P, M, V: s_rv(build(P, M))),
        "spn": jax.jit(lambda P, M, V: s_spn(build(P, M))),
        "dist": jax.jit(lambda P, M, V: s_dist(build(P, M))),
        "nbr": jax.jit(lambda P, M, V: s_nbr(build(P, M))),
        "pn": jax.jit(pn_graph),
    }
    prev = 0.0
    for name, fn in graphs.items():
        t, c = timeit(fn, positions, mask, values)
        print(f"{name:5s}: {t*1e3:8.1f} ms (+{(t-prev)*1e3:7.1f}) "
              f"(compile {c:.0f}s)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
