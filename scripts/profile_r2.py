"""Round-2 ablation profiling: inside the lattice build and the pointnet head.

Round-1 final split at 0.73 s/seq (CLAUDE.md): lattice build 274 ms,
pointnet ~71 ms/frame, convs ~46 ms/frame.  One-dispatch delta graphs at
bench scale:

lattice build:
  union0        elevate + simplex + level-0 birth union (row_idx out)
  mean_scatter  + per-frame local-mean via segment_sum/gather (r1 path)
  mean_inunion  + in-union scan-based local mean (r2 path)
  lvl0          union0 + _build_level(0) (sort + MXU neighbor lookup)

pointnet (4 frames each, prebuilt lattice):
  pn_mlp        MLP over rows only
  pn_segmax     + plain masked segment_max
  pn_packed     + packed value+bary max (r2 path, one scatter)
  pn_full_r1    + argmax recovery + bary gather + counts (r1 chain)
  conv8         8 lattice convs at (cap, 64) with the prebuilt nbr table
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


def timeit(fn, *args, iters=3):
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
    ap.add_argument("--points", type=int, default=120_000)
    ap.add_argument("--capacity", type=int, default=98_304)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--lidar", action="store_true",
                    help="use the ray-cast LiDAR generator")
    args = ap.parse_args()

    from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
    from temporal_latticenet_tpu.data.synthetic import synthetic_sequence
    from temporal_latticenet_tpu.data.lidar_like import lidar_sequence
    from temporal_latticenet_tpu.ops import permutohedral as pm
    from temporal_latticenet_tpu.ops import seq_lattice as sl
    from temporal_latticenet_tpu.ops import segment as seg
    from temporal_latticenet_tpu.ops.vertex_table import SENTINEL, pack_keys

    max_pts = 131072
    rt = RuntimeConfig(max_points=max_pts, capacity_level0=args.capacity,
                       capacity_decay=0.75, min_capacity=8192, sigma=0.6)
    cfg = ModelConfig(nr_classes=26,
                      rnn_modules=("gru", "gru", "aflow", "gru"),
                      frames_per_seq=args.frames)
    caps = rt.capacities(cfg.nr_downsamples)
    T = args.frames
    P = max_pts
    dp1 = 4
    cap0 = caps[0]

    rng = np.random.default_rng(0)
    if args.lidar:
        p, v, l, m = lidar_sequence(rng, T, max_pts)
    else:
        p, v, l, m = synthetic_sequence(rng, T, args.points, max_pts)
    positions, values, mask = jnp.asarray(p), jnp.asarray(v), jnp.asarray(m)

    # ---- lattice build internals ---------------------------------------
    def _union_prefix(positions, mask):
        elevated = pm.elevate(positions.reshape(T * P, 3), rt.sigma)
        keys, bary = pm.find_enclosing_simplex(elevated)
        keys = keys.reshape(T, P * dp1, 3)
        bary = bary.reshape(T, P * dp1)
        rvalid = jnp.repeat(mask, dp1, axis=1)
        flat_keys = jnp.where(rvalid.reshape(-1)[:, None],
                              keys.reshape(-1, 3), SENTINEL)
        cand_packed = pack_keys(flat_keys)
        return cand_packed, bary, rvalid

    @jax.jit
    def union0(positions, mask):
        cand_packed, _, _ = _union_prefix(positions, mask)
        order = jnp.arange(T * P * dp1, dtype=jnp.int32)
        _, _, row_idx, _ = sl._union_with_birth(cand_packed, order, cap0, T)
        return row_idx

    @jax.jit
    def mean_scatter(positions, mask):
        cand_packed, _, rvalid = _union_prefix(positions, mask)
        order = jnp.arange(T * P * dp1, dtype=jnp.int32)
        _, _, row_idx, _ = sl._union_with_birth(cand_packed, order, cap0, T)
        row_vertex = row_idx.reshape(T, P * dp1)
        row_valid = rvalid & (row_vertex > 0)
        pos_rows = jnp.repeat(positions, dp1, axis=1)
        w = row_valid.astype(jnp.float32)

        def mean_one(pr, rv, wi):
            data = jnp.concatenate([pr * wi[:, None], wi[:, None]], axis=1)
            s = jax.ops.segment_sum(data, rv, num_segments=cap0)
            mean = s[:, :3] / jnp.maximum(s[:, 3:], 1.0)
            return pr - mean[rv]
        rel = jax.vmap(mean_one)(pos_rows, row_vertex, w) * w[..., None]
        return rel

    @jax.jit
    def mean_inunion(positions, mask):
        cand_packed, _, _ = _union_prefix(positions, mask)
        pos_rows = jnp.repeat(positions, dp1, axis=1)
        _, _, _, _, rel, nr, _ = sl._union_with_birth_and_mean(
            cand_packed, pos_rows.reshape(-1, 3), cap0, T)
        return rel + nr.sum()

    @jax.jit
    def lvl0(positions, mask):
        cand_packed, _, _ = _union_prefix(positions, mask)
        order = jnp.arange(T * P * dp1, dtype=jnp.int32)
        packed0, birth0, row_idx, counts0 = sl._union_with_birth(
            cand_packed, order, cap0, T)
        lv, _ = sl._build_level(packed0, birth0, counts0, T)
        return lv.nbr_idx + row_idx.sum()

    # ---- pointnet internals --------------------------------------------
    lat = jax.jit(lambda p_, m_: sl.build_sequence_lattice(
        p_, m_, rt.sigma, caps, cfg.nr_downsamples))(positions, mask)
    lat = jax.block_until_ready(lat)

    cd = jnp.bfloat16
    k1 = jax.random.normal(jax.random.PRNGKey(0), (4, 16), jnp.float32)
    k2 = jax.random.normal(jax.random.PRNGKey(1), (16, 32), jnp.float32)
    k3 = jax.random.normal(jax.random.PRNGKey(2), (32, 64), jnp.float32)
    ck = jax.random.normal(jax.random.PRNGKey(3), (9 * 128, 64), jnp.float32)
    cw = jax.random.normal(jax.random.PRNGKey(4), (9 * 64, 64), jnp.float32)

    def mlp_rows(rel, vrow):
        x = jnp.concatenate([rel, vrow], axis=-1).astype(cd)
        x = jax.nn.relu(jnp.dot(x, k1.astype(cd),
                                preferred_element_type=jnp.float32)).astype(cd)
        x = jax.nn.relu(jnp.dot(x, k2.astype(cd),
                                preferred_element_type=jnp.float32)).astype(cd)
        x = jnp.dot(x, k3.astype(cd),
                    preferred_element_type=jnp.float32).astype(cd)
        return x

    def frame_inputs(t):
        return (lat.row_rel_pos[t],
                jnp.repeat(values[t], dp1, axis=0) * lat.row_valid[t][:, None],
                lat.row_vertex[t], lat.row_valid[t], lat.row_bary[t])

    @jax.jit
    def pn_mlp(values):
        s = 0.0
        for t in range(T):
            rel, vr, rid, rva, rb = frame_inputs(t)
            s = s + mlp_rows(rel, vr).sum()
        return s

    @jax.jit
    def pn_segmax(values):
        s = 0.0
        for t in range(T):
            rel, vr, rid, rva, rb = frame_inputs(t)
            x = mlp_rows(rel, vr)
            neg = jnp.asarray(-jnp.inf, x.dtype)
            masked = jnp.where(rva[:, None], x, neg)
            mx = jax.ops.segment_max(masked, rid, num_segments=cap0)
            s = s + jnp.where(jnp.isfinite(mx), mx, 0.0).sum()
        return s

    @jax.jit
    def pn_packed(values):
        s = 0.0
        for t in range(T):
            rel, vr, rid, rva, rb = frame_inputs(t)
            x = mlp_rows(rel, vr)
            mx, bsel = seg.segment_max_with_bary_packed(x, rb, rid, cap0, rva)
            s = s + mx.sum() + bsel.sum()
        return s

    @jax.jit
    def pn_full_r1(values):
        s = 0.0
        for t in range(T):
            rel, vr, rid, rva, rb = frame_inputs(t)
            x = mlp_rows(rel, vr)
            counts = jax.ops.segment_sum(rva.astype(jnp.float32), rid,
                                         num_segments=cap0)
            mx, arg = seg.segment_max_with_argmax(x, rid, cap0, rva)
            mx = mx.astype(jnp.float32)
            bary_sel = jnp.where(arg >= 0, rb[jnp.maximum(arg, 0)], 0.0)
            reduced = jnp.concatenate([mx, bary_sel], axis=-1)
            reduced = jnp.where((counts >= 4)[:, None], reduced, 0.0)
            s = s + reduced.sum()
        return s

    nbr_idx = lat.levels[0].nbr_idx

    @jax.jit
    def conv8(x):
        v = x
        for _ in range(8):
            g = v[nbr_idx].reshape(cap0, -1)
            v = jnp.dot(g, cw.astype(cd), preferred_element_type=jnp.float32
                        ).astype(cd)
        return v

    x64 = jax.random.normal(jax.random.PRNGKey(7), (cap0, 64), cd)

    results = {}
    for name, fn, a in [
        ("union0", union0, (positions, mask)),
        ("mean_scatter", mean_scatter, (positions, mask)),
        ("mean_inunion", mean_inunion, (positions, mask)),
        ("lvl0", lvl0, (positions, mask)),
        ("pn_mlp", pn_mlp, (values,)),
        ("pn_segmax", pn_segmax, (values,)),
        ("pn_packed", pn_packed, (values,)),
        ("pn_full_r1", pn_full_r1, (values,)),
        ("conv8", conv8, (x64,)),
    ]:
        t, c = timeit(fn, *a)
        results[name] = t
        print(f"{name:12s}: {t*1e3:9.1f} ms   (compile {c:.0f}s)", flush=True)

    print("\nDeltas:")
    print(f"  local mean r1 (scatter) : {(results['mean_scatter']-results['union0'])*1e3:8.1f} ms")
    print(f"  local mean r2 (in-union): {(results['mean_inunion']-results['union0'])*1e3:8.1f} ms")
    print(f"  build_level(0)          : {(results['lvl0']-results['union0'])*1e3:8.1f} ms")
    print(f"  segmax plain   (4f)     : {(results['pn_segmax']-results['pn_mlp'])*1e3:8.1f} ms")
    print(f"  packed max+bary (4f)    : {(results['pn_packed']-results['pn_mlp'])*1e3:8.1f} ms")
    print(f"  r1 argmax chain (4f)    : {(results['pn_full_r1']-results['pn_mlp'])*1e3:8.1f} ms")
    print(f"  per-conv (cap,64)       : {results['conv8']/8*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
