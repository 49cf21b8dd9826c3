"""Marginal per-invocation cost of the Pallas scan kernels, isolated.

The cut-style profilers (profile_spn_internals.py) suffer attribution
leakage: XLA prunes unused sort operands in early-cut graphs, so the
delta labelled "sumscan" also re-widens the union's sorts.  This harness
instead times CHAINED kernel invocations inside one jitted graph --
y_{k+1} = kernel(ids, y_k) -- so (K=n) - (K=1) divided by (n-1) is the
true marginal cost of one invocation, with the dispatch floor and any
graph-context costs cancelled.

References measured alongside:
  * an XLA elementwise pass over the same bytes (the traffic floor);
  * a trivial Pallas copy kernel over the same tiles (Pallas overhead
    floor: same grid, same BlockSpecs, no scan logic).
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

from temporal_latticenet_tpu.ops import pallas_scan as ps


def timeit(fn, *args, iters=5):
    t0 = time.perf_counter()
    float(jax.tree_util.tree_leaves(fn(*args))[0].sum())
    c = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jax.tree_util.tree_leaves(fn(*args))[0].sum())
        ts.append(time.perf_counter() - t0)
    return min(ts), c


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1


def pallas_copy(x, rows=512):
    """Per-tile read+write with the same (rows, 128) blocking as the
    lane-packed scan kernels; no scan logic, no scratch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, c = x.shape
    qp = q * c // 128
    return pl.pallas_call(
        _copy_kernel,
        grid=(qp // rows,),
        in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, 128), x.dtype),
    )(x.reshape(qp, 128)).reshape(q, c)


def chain(fn, k):
    def g(ids, y):
        for _ in range(k):
            y = fn(ids, y)
        return y.sum()
    return jax.jit(g)


def chain_noid(fn, k):
    def g(y):
        for _ in range(k):
            y = fn(y)
        return y.sum()
    return jax.jit(g)


def report(name, fn_k1, fn_kn, n, *args):
    t1, c1 = timeit(fn_k1, *args)
    tn, cn = timeit(fn_kn, *args)
    marg = (tn - t1) / (n - 1)
    print(f"{name:28s}: K=1 {t1*1e3:7.1f} ms, K={n} {tn*1e3:7.1f} ms "
          f"-> marginal {marg*1e3:7.2f} ms (compile {c1:.0f}/{cn:.0f}s)",
          flush=True)
    return marg


def main():
    Q = 2097152
    rng = np.random.default_rng(0)
    heads = rng.random(Q) < (1 / 13.0)
    heads[0] = True
    ids = jnp.asarray(np.cumsum(heads).astype(np.int32))
    x4 = jnp.asarray(rng.standard_normal((Q, 4)).astype(np.float32) * 1e-3)
    x64 = jnp.asarray(
        rng.integers(1, 1 << 31, (Q, 64), dtype=np.int64).astype(np.uint32))
    x1 = jnp.asarray(np.abs(rng.standard_normal((Q, 64))
                            ).astype(np.float32) * 1e-6)

    # XLA elementwise traffic reference over (Q, 64) f32 = 512 MB
    report("xla_eltwise_512MB", chain_noid(lambda y: y * 1.000001 + 1e-9, 1),
           chain_noid(lambda y: y * 1.000001 + 1e-9, 5), 5, x1)
    # Pallas copy kernel over the same bytes
    report("pallas_copy_512MB", chain_noid(pallas_copy, 1),
           chain_noid(pallas_copy, 5), 5, x1)
    # Pallas copy over (Q, 4) f32 = 32 MB
    report("pallas_copy_32MB", chain_noid(pallas_copy, 1),
           chain_noid(pallas_copy, 5), 5, x4)

    # the union's (Q, 4) f32 segmented sum scan
    f_sum = lambda i, y: ps.sorted_segment_scan(i, y, "sum")
    report("seg_sum_scan_4ch", chain(f_sum, 1), chain(f_sum, 5), 5, ids, x4)

    # the chunked (lane-only) scan used by seg_sum_tails
    f_chk = lambda i, y: ps.sorted_segment_scan_chunked(i, y, "sum")
    report("seg_sum_chunked_4ch", chain(f_chk, 1), chain(f_chk, 5), 5,
           ids, x4)

    # 1-channel cumsum (the _blocked_cumsum Pallas path)
    zids = jnp.zeros((Q,), jnp.int32)
    f_c1 = lambda i, y: ps.sorted_segment_scan(i, y * 1e-7, "sum")
    report("cumsum_1ch", chain(f_c1, 1), chain(f_c1, 5), 5,
           zids, x4[:, :1])

    # the pointnet's (Q, 64) u32 segmented max scan (full window)
    f_max = lambda i, y: ps.sorted_segment_max_u32(i, y)
    report("seg_max_u32_64ch", chain(f_max, 1), chain(f_max, 3), 3,
           ids, x64)

    # windowed variant (4 doubling passes instead of 11)
    f_maxw = lambda i, y: ps.sorted_segment_max_u32(i, y, max_window=8)
    report("seg_max_u32_64ch_w8", chain(f_maxw, 1), chain(f_maxw, 3), 3,
           ids, x64)


if __name__ == "__main__":
    main()
