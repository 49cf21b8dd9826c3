"""Cumulative cuts INSIDE the batched pointnet reduce (the +31.5 ms stage
of scripts/profile_build_split.py).  Each graph returns tiny sums forcing
exactly the ops up to its cut; deltas attribute cost to:

  g0   nbr baseline (full build, no pointnet)
  g1   + the (Q, 5) vals+bary gather by spn.so
  g2   + the 3-layer bf16 MLP on (Q, 7)
  g3   + the value+bary uint32 pack (_pack_value_bary)
  g4   + the Pallas segmented max scan (full Q)
  g5   + tail extraction, decode, (T, cap, 2C) assembly (= the real reduce)
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
    from temporal_latticenet_tpu.ops import pallas_scan as ps

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

    def s_nbr(lat):
        out = lat.row_vertex.sum().astype(jnp.float32)
        spn = lat.sorted_pn
        out = (out + spn.rel.sum() + spn.so.sum().astype(jnp.float32)
               + spn.live.sum() + spn.head_vf.sum()
               + spn.bucket.sum().astype(jnp.float32)
               + spn.tailpos.sum().astype(jnp.float32)
               + lat.nr_points.sum() + lat.row_bary.sum()
               + lat.point_vertex.sum().astype(jnp.float32)
               + lat.point_bary.sum())
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

    def gathered(lat, V):
        spn = lat.sorted_pn
        t, p_, v_ = V.shape
        vals_flat = jnp.repeat(V.reshape(t * p_, v_), 4, axis=0)
        bary_flat = lat.row_bary.reshape(-1)
        vb = jnp.concatenate([vals_flat, bary_flat[:, None]], 1)[spn.so]
        vals_s = vb[:, :v_] * spn.live[:, None]
        bary_s = vb[:, v_]
        return vals_s, bary_s

    def mlp(lat, vals_s):
        spn = lat.sorted_pn
        x = jnp.concatenate([spn.rel, vals_s], -1).astype(jnp.bfloat16)
        for k, b in zip(ks, bs):
            x = (jnp.dot(x, k.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) + b
                 ).astype(jnp.bfloat16)
            if k is not ks[-1]:
                x = jax.nn.relu(x)
        return x

    def g1(P, M, V):
        lat = build(P, M)
        vals_s, bary_s = gathered(lat, V)
        return s_nbr(lat) + vals_s.sum() + bary_s.sum()

    def g2(P, M, V):
        lat = build(P, M)
        vals_s, bary_s = gathered(lat, V)
        x = mlp(lat, vals_s)
        return s_nbr(lat) + x.sum().astype(jnp.float32) + bary_s.sum()

    def g3(P, M, V):
        lat = build(P, M)
        vals_s, bary_s = gathered(lat, V)
        x = mlp(lat, vals_s)
        packed = seg._pack_value_bary(x, bary_s, lat.sorted_pn.live)
        return s_nbr(lat) + packed.sum().astype(jnp.float32)

    def g4(P, M, V):
        lat = build(P, M)
        spn = lat.sorted_pn
        vals_s, bary_s = gathered(lat, V)
        x = mlp(lat, vals_s)
        packed = seg._pack_value_bary(x, bary_s, spn.live)
        best = seg._seg_max_full_scan(spn.head_vf, packed)
        return s_nbr(lat) + best.sum().astype(jnp.float32)

    def g5(P, M, V):
        lat = build(P, M)
        spn = lat.sorted_pn
        vals_s, bary_s = gathered(lat, V)
        x = mlp(lat, vals_s)
        mx, bary_sel = seg.sorted_packed_max(
            x, bary_s, spn.live, spn.head_vf, spn.bucket, spn.tailpos,
            lat.nr_points > 0)
        cap = lat.nr_points.shape[1]
        c = x.shape[-1]
        t = V.shape[0]
        reduced = jnp.concatenate([mx.reshape(t, cap, c),
                                   bary_sel.reshape(t, cap, c)], axis=-1)
        reduced = jnp.where((lat.nr_points >= 4)[..., None], reduced, 0.0)
        return s_nbr(lat) + reduced.sum()

    graphs = {
        "g0_nbr": jax.jit(lambda P, M, V: s_nbr(build(P, M))),
        "g1_gather": jax.jit(g1),
        "g2_mlp": jax.jit(g2),
        "g3_pack": jax.jit(g3),
        "g4_maxscan": jax.jit(g4),
        "g5_full": jax.jit(g5),
    }
    prev = 0.0
    for name, fn in graphs.items():
        t, c = timeit(fn, positions, mask, values)
        print(f"{name:10s}: {t*1e3:8.1f} ms (+{(t-prev)*1e3:7.1f}) "
              f"(compile {c:.0f}s)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
