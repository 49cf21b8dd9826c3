"""Composite-stage TPU profiling: where do the 274 ms (lattice build) and
71 ms/frame (pointnet) actually go?  Same delta methodology as
profile_ops.py."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

T, P = 4, 131072
R = P * 4
Q = T * R
C0 = 98304


def measured(fn, args, lo=1, hi=6):
    f = jax.jit(fn)
    f(lo, *args)
    def run(n):
        t0 = time.perf_counter()
        float(f(n, *args).sum())
        return time.perf_counter() - t0
    run(lo)
    a = min(run(lo) for _ in range(2))
    b = min(run(hi) for _ in range(2))
    return (b - a) / (hi - lo)


def rep(op):
    def fn(n, x, *rest):
        def body(i, acc):
            out = op(acc, *rest)
            return acc + (jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]
                          ).astype(acc.dtype)
        return jax.lax.fori_loop(0, n, body, x)
    return fn


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)

    from temporal_latticenet_tpu.config import RuntimeConfig
    from temporal_latticenet_tpu.data.synthetic import synthetic_sequence
    from temporal_latticenet_tpu.ops import seq_lattice as sl
    from temporal_latticenet_tpu.ops import segment as seg
    from temporal_latticenet_tpu.ops.vertex_table import pack_keys, SENTINEL

    rt = RuntimeConfig(max_points=P, capacity_level0=C0,
                       capacity_decay=0.75, min_capacity=8192, sigma=0.6)
    caps = rt.capacities(2)
    p, v, l, m = synthetic_sequence(rng, T, 120000, P)
    POS, MSK = jnp.asarray(p), jnp.asarray(m)

    cases = {}

    # ---- composite: the full whole-sequence lattice build ----------------
    def build(pos, msk):
        lat = sl.build_sequence_lattice(pos, msk, rt.sigma, caps, 2)
        return lat.row_bary
    cases["build_seqlat"] = (rep(build), (POS, MSK))

    # ---- union0 only ------------------------------------------------------
    from temporal_latticenet_tpu.ops import permutohedral as pm
    def prep_cands(pos, msk):
        el = pm.elevate(pos.reshape(T * P, 3), rt.sigma)
        keys, bary = pm.find_enclosing_simplex(el)
        rvalid = jnp.repeat(msk, 4, axis=1)
        flat = jnp.where(rvalid.reshape(-1)[:, None], keys.reshape(-1, 3),
                         SENTINEL)
        return pack_keys(flat)
    CAND = jax.jit(prep_cands)(POS, MSK)

    def union0(cand):
        pk, bi, ri, ct = sl._union_with_birth(
            cand, jnp.arange(Q, dtype=jnp.int32), C0, T)
        return ri.astype(jnp.uint32)
    cases["union0"] = (rep(union0), (CAND,))

    def elevate_simplex(pos):
        el = pm.elevate(pos.reshape(T * P, 3), rt.sigma)
        keys, bary = pm.find_enclosing_simplex(el)
        return bary
    cases["elevate_simplex"] = (rep(elevate_simplex), (POS,))

    # ---- one _build_level at level-0 size --------------------------------
    pk0, bi0, ri0, ct0 = jax.jit(
        lambda c: sl._union_with_birth(c, jnp.arange(Q, dtype=jnp.int32),
                                       C0, T))(CAND)
    def lvl(pk, bi, ct):
        lv, _ = sl._build_level(pk, bi, ct, T)
        return lv.nbr_idx.astype(jnp.uint32)
    cases["build_level0"] = (rep(lambda x, b, c: lvl(x, b, c)), (pk0, bi0, ct0))

    # ---- rel-pos local mean (the vmapped segment mean) --------------------
    rv = jnp.asarray(rng.integers(0, C0, (T, R)).astype(np.int32))
    w = jnp.asarray((rng.random((T, R)) < 0.9).astype(np.float32))
    pr = jnp.asarray(rng.standard_normal((T, R, 3)).astype(np.float32))
    def relmean(pr_, rv_, w_):
        def one(pp, rr, ww):
            data = jnp.concatenate([pp * ww[:, None], ww[:, None]], axis=1)
            s = jax.ops.segment_sum(data, rr, num_segments=C0)
            return pp - (s[:, :3] / jnp.maximum(s[:, 3:], 1.0))[rr]
        return jax.vmap(one)(pr_, rv_, w_)
    cases["relmean_4f"] = (rep(relmean), (pr, rv, w))

    # ---- pointnet reduction: current vs gatherless bary ------------------
    x64 = jnp.asarray(rng.standard_normal((R, 64)).astype(np.float32))
    x64b = x64.astype(jnp.bfloat16)
    rid = rv[0]
    rvalid = w[0] > 0
    bary = jnp.asarray(rng.random(R).astype(np.float32))

    def reduce_current(x, rid_, rvalid_, bary_):
        mx, arg = seg.segment_max_with_argmax(x, rid_, C0, rvalid_)
        mx = mx.astype(jnp.float32)
        bs = jnp.where(arg >= 0, bary_[jnp.maximum(arg, 0)], 0.0)
        return jnp.concatenate([mx, bs], axis=-1)
    cases["pn_reduce_current"] = (rep(reduce_current), (x64b, rid, rvalid, bary))

    def reduce_new(x, rid_, rvalid_, bary_):
        neg = jnp.asarray(-jnp.inf, x.dtype)
        masked = jnp.where(rvalid_[:, None], x, neg)
        mx = jax.ops.segment_max(masked, rid_, num_segments=C0)
        has = jnp.isfinite(mx)
        winner = (masked == mx[rid_]) & rvalid_[:, None]
        bs = jax.ops.segment_max(jnp.where(winner, bary_[:, None], -1.0),
                                 rid_, num_segments=C0)
        mxz = jnp.where(has, mx, 0.0).astype(jnp.float32)
        bs = jnp.where(has & (bs >= 0), bs, 0.0)
        return jnp.concatenate([mxz, bs], axis=-1)
    cases["pn_reduce_new"] = (rep(reduce_new), (x64b, rid, rvalid, bary))

    arg = jnp.asarray(rng.integers(0, R, (C0, 64)).astype(np.int32))
    cases["bary_gather_6.3M"] = (
        rep(lambda a, b: b[a]), (arg, bary))

    # ---- merge lookup vs mxu at 885k --------------------------------------
    table = jnp.asarray(np.sort(rng.choice(2**22, C0, replace=False)
                                ).astype(np.uint32))
    q885 = jnp.asarray(rng.integers(0, 2**22, C0 * 9).astype(np.uint32))
    cases["merge_lookup_885k"] = (
        rep(lambda q, t: sl._merge_lookup(t, q).astype(jnp.uint32)),
        (q885, table))

    for name, (fn, a) in cases.items():
        try:
            t0 = time.perf_counter()
            dt = measured(fn, a)
            print(f"{name:22s}: {dt*1e3:8.2f} ms/iter   "
                  f"(total {time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa
            print(f"{name:22s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
