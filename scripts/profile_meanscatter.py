"""A/B the union mean-table scatter: full-Q set-scatter vs tail-compaction.

(Historical r3 measurement on isolated graphs; the losing full-Q "table"
mode was deleted in r4 -- the surviving table_tails path keeps the
compacted scatter this A/B selected.)

The full-Q variant scatters ALL Q=2M rows into the
(T*cap+1, 5) table -- non-tail rows write a junk slot, but scatter cost is
per SOURCE row.  The alternative compacts the ~T*cap real tail rows to the
front with one more multi-operand sort (sorts are ~2.6 ms/operand-ish at
2M rows) and scatters only a static T*cap-row slice.  This measures both
on isolated graphs with a realistic tail density (~7% of rows are tails),
plus the Q-row gather that reads the table back.

Every absolute number includes the ~31 ms dispatch floor once; deltas vs
the `base` graph are the real costs.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

Q = 1 << 21
M = 4 * 49152  # T * capacity


def timeit(fn, *args, iters=5):
    t0 = time.perf_counter()
    float(fn(*args).sum())
    c = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args).sum())
        ts.append(time.perf_counter() - t0)
    return min(ts), c


def main():
    rng = np.random.default_rng(0)
    is_tail = rng.random(Q) < 0.07
    dst = np.where(is_tail, rng.integers(0, M, Q), M).astype(np.int32)
    vals = rng.normal(size=(Q, 5)).astype(np.float32)
    bucket = np.where(is_tail, dst, M).astype(np.int32)
    dst_d, vals_d, bucket_d = map(jnp.asarray, (dst, vals, bucket))

    @jax.jit
    def base(d, v, b):
        return v.sum() + d.sum() + b.sum()

    @jax.jit
    def scat_full(d, v, b):
        buf = jnp.zeros((M + 1, 5), jnp.float32).at[d].set(v)
        return buf.sum()

    @jax.jit
    def scat_compact(d, v, b):
        key = jnp.where(d < M, d.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))
        sk, v0, v1, v2, v3, v4 = jax.lax.sort(
            (key, v[:, 0], v[:, 1], v[:, 2], v[:, 3], v[:, 4]),
            dimension=0, num_keys=1)
        dd = jnp.where(sk[:M] < M, sk[:M].astype(jnp.int32), M)
        vv = jnp.stack([v0[:M], v1[:M], v2[:M], v3[:M], v4[:M]], 1)
        buf = jnp.zeros((M + 1, 5), jnp.float32).at[dd].set(vv)
        return buf.sum()

    @jax.jit
    def scat_1ch(d, v, b):
        buf = jnp.zeros((M + 1,), jnp.float32).at[d].set(v[:, 0])
        return buf.sum()

    @jax.jit
    def gath(d, v, b):
        buf = jnp.zeros((M + 1, 5), jnp.float32).at[d].set(v)
        return buf[b].sum()

    t0, _ = timeit(base, dst_d, vals_d, bucket_d)
    print(f"base        : {t0*1e3:7.1f} ms", flush=True)
    for name, fn in [("scat_full", scat_full), ("scat_compact", scat_compact),
                     ("scat_1ch", scat_1ch), ("gath(+full)", gath)]:
        t, c = timeit(fn, dst_d, vals_d, bucket_d)
        print(f"{name:12s}: {t*1e3:7.1f} ms (+{(t-t0)*1e3:6.1f}) "
              f"(compile {c:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
