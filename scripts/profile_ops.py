"""Primitive-level TPU profiling at bench scale.

Per-dispatch round trip through the tunnel is ~35 ms, so each op is run
``iters`` times inside ONE jitted graph (lax.fori_loop with a data
dependency that defeats CSE) and cost is the (iters_hi - iters_lo) delta.

Targets (bench scale: T=4, P=131072 -> R=524288 rows/frame, Q=2M union
candidates, C0=98304 vertices):
  sorts, inverse-permutation scatter, segment reductions, associative-scan
  segmented max, MXU lookup, conv row gather+matmul -- plus the composite
  build_sequence_lattice / union stages.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

T, P = 4, 131072
R = P * 4            # pointnet rows per frame
Q = T * R            # union candidates
C0 = 98304           # level-0 capacity
NOFF = 9


def measured(fn, args, lo=2, hi=12):
    f = jax.jit(fn, static_argnums=())
    f(lo, *args)  # compile
    def run(n):
        t0 = time.perf_counter()
        float(f(n, *args).sum())
        return time.perf_counter() - t0
    run(lo)
    a = min(run(lo) for _ in range(2))
    b = min(run(hi) for _ in range(2))
    return (b - a) / (hi - lo)


def rep(op):
    """fori_loop wrapper: x changes every iter via a cheap data dependency."""
    def fn(n, x, *rest):
        def body(i, acc):
            out = op(acc, *rest)
            # fold the output back into the input shape, keep dtype
            return acc + (out.reshape(-1)[0]).astype(acc.dtype)
        return jax.lax.fori_loop(0, n, body, x)
    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    keys = jnp.asarray(rng.integers(0, 2**22, Q).astype(np.uint32))
    perm = jnp.asarray(rng.permutation(Q).astype(np.int32))
    payload = jnp.arange(Q, dtype=jnp.int32)
    rows64 = jnp.asarray(rng.standard_normal((R, 64)).astype(np.float32))
    rows64b = rows64.astype(jnp.bfloat16)
    segids = jnp.asarray(np.sort(rng.integers(0, C0, R)).astype(np.int32))
    segids_un = jnp.asarray(rng.integers(0, C0, R).astype(np.int32))
    table = jnp.asarray(np.sort(rng.choice(2**22, C0, replace=False)).astype(np.uint32))
    queries9 = jnp.asarray(rng.integers(0, 2**22, C0 * NOFF).astype(np.uint32))
    nbr_idx = jnp.asarray(rng.integers(0, C0, (C0, NOFF)).astype(np.int32))
    w_conv = jnp.asarray(rng.standard_normal((NOFF * 64, 64)).astype(np.float32) * 0.1)
    vals_c = jnp.asarray(rng.standard_normal((C0, 64)).astype(np.float32))

    from temporal_latticenet_tpu.ops.mxu_lookup import mxu_lookup_positions
    from temporal_latticenet_tpu.ops import segment as seg

    cases = {}

    # --- sorts ---------------------------------------------------------
    cases["sort1_2M_u32"] = (rep(lambda x: jax.lax.sort(x)), (keys,))
    cases["sort2_k1_2M"] = (
        rep(lambda x, p: jax.lax.sort((x, p), num_keys=1)[0]), (keys, payload))
    cases["sort2_k2_2M"] = (
        rep(lambda x, p: jax.lax.sort((x, p.astype(jnp.int32)), num_keys=2)[0]),
        (keys, payload))
    cases["sort3_k2_2M"] = (
        rep(lambda x, p: jax.lax.sort((x, p, p), num_keys=2)[0]),
        (keys, payload))
    # batched: 4 independent rows of 512k (the per-frame alternative)
    keys2d = keys.reshape(T, R)
    cases["sort2d_4x512k"] = (
        rep(lambda x: jax.lax.sort(x, dimension=1)), (keys2d,))

    # --- permutation moves ----------------------------------------------
    cases["iscatter_2M"] = (
        rep(lambda x, pm: jnp.zeros((Q,), jnp.int32).at[pm].set(
            x.astype(jnp.int32)).astype(jnp.uint32)), (keys, perm))
    cases["gather_2M"] = (rep(lambda x, pm: x[pm]), (keys, perm))

    # --- segment reductions (R rows -> C0 vertices, 64ch) ---------------
    cases["segmax_sorted"] = (
        rep(lambda x, s: jax.ops.segment_max(x, s, num_segments=C0,
                                             indices_are_sorted=True)),
        (rows64, segids))
    cases["segmax_unsorted"] = (
        rep(lambda x, s: jax.ops.segment_max(x, s, num_segments=C0)),
        (rows64, segids_un))
    cases["segsum_unsorted"] = (
        rep(lambda x, s: jax.ops.segment_sum(x, s, num_segments=C0)),
        (rows64, segids_un))
    cases["segmax_argmax_full"] = (
        rep(lambda x, s: seg.segment_max_with_argmax(x, s, C0)[0]),
        (rows64, segids_un))
    cases["segsum_rel3"] = (
        rep(lambda x, s: jax.ops.segment_sum(x, s, num_segments=C0)),
        (rows64[:, :3], segids_un))

    # sorted-segment alternative: segmented associative scan + tail gather
    def seg_scan_max(x, s):
        head = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
        def comb(a, b):
            ha, va = a
            hb, vb = b
            return hb | ha, jnp.where(hb[:, None], vb, jnp.maximum(va, vb))
        _, scanned = jax.lax.associative_scan(comb, (head, x))
        tail = jnp.concatenate([s[1:] != s[:-1], jnp.ones((1,), bool)])
        tpos = jnp.where(tail, s, C0)
        return jnp.zeros((C0, x.shape[1]), x.dtype).at[tpos].set(
            scanned, mode="drop")
    cases["segscan_max_sorted"] = (rep(seg_scan_max, ), (rows64, segids))
    cases["segscan_max_bf16"] = (rep(seg_scan_max, ), (rows64b, segids))

    # --- lookups ---------------------------------------------------------
    cases["mxu_lookup_885k"] = (
        rep(lambda q, t: mxu_lookup_positions(t, q)), (queries9, table))
    q2m = keys
    cases["mxu_lookup_2M"] = (
        rep(lambda q, t: mxu_lookup_positions(t, q)), (q2m, table))

    # --- conv row gather + matmul ---------------------------------------
    def conv(v, idx, w):
        g = v[idx].reshape(C0, -1)
        return jnp.dot(g, w, preferred_element_type=jnp.float32)
    cases["conv_gather_mm"] = (rep(conv, ), (vals_c, nbr_idx, w_conv))
    cases["conv_gather_only"] = (
        rep(lambda v, idx: v[idx].reshape(C0, -1).sum(1, keepdims=True)),
        (vals_c, nbr_idx))

    only = [s for s in args.only.split(",") if s]
    for name, (fn, a) in cases.items():
        if only and not any(o in name for o in only):
            continue
        try:
            t0 = time.perf_counter()
            dt = measured(fn, a)
            print(f"{name:24s}: {dt*1e3:8.2f} ms/iter   "
                  f"(total {time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa
            print(f"{name:24s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
