"""A/B the two-level tail segment max vs the full Pallas scan (TPU).

Bench-scale synthetic (Q=2M, C=64, ~7% head rate like the union's
(vertex, frame) sub-runs).  Both variants end at the same (B, C) tail
values, so the delta is the scan-work saving.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

from temporal_latticenet_tpu.ops import pallas_scan as ps
from temporal_latticenet_tpu.ops import seq_lattice as sl

Q = 1 << 21
C = 64
G = 8


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
    heads = rng.random(Q) < 0.07
    heads[0] = True
    headj = jnp.asarray(heads)
    x = jnp.asarray(rng.integers(0, 2**32, (Q, C), dtype=np.uint64)
                    .astype(np.uint32))
    tails_np = np.nonzero(np.concatenate([heads[1:], [True]]))[0]
    tails_np = tails_np[:196608] if tails_np.size > 196608 else tails_np
    tailpos = jnp.asarray(tails_np.astype(np.int32))

    @jax.jit
    def base(h, v, t):
        return h.sum().astype(jnp.float32) + v.sum().astype(jnp.float32) \
            + t.sum().astype(jnp.float32)

    t0, _ = timeit(base, headj, x, tailpos)
    print(f"base     : {t0*1e3:7.1f} ms", flush=True)

    @jax.jit
    def full(h, v, t):
        hc = sl._blocked_cumsum(h.astype(jnp.int32))
        return ps.sorted_segment_max_u32(hc, v)[t].astype(jnp.float32)

    t1, c1 = timeit(full, headj, x, tailpos)
    print(f"full scan: {t1*1e3:7.1f} ms (+{(t1-t0)*1e3:6.1f}) "
          f"(compile {c1:.0f}s)", flush=True)

    @jax.jit
    def twolevel(h, v, t):
        hc = sl._blocked_cumsum(h.astype(jnp.int32))
        xc = v.reshape(Q // G, G, C)
        hcc = hc.reshape(Q // G, G)
        step = 1
        while step < G:
            same = hcc[:, step:] == hcc[:, :-step]
            xs = jnp.where(same[..., None],
                           jnp.maximum(xc[:, step:], xc[:, :-step]),
                           xc[:, step:])
            xc = jnp.concatenate([xc[:, :step], xs], axis=1)
            step *= 2
        summ = xc[:, G - 1]
        hce = hcc[:, G - 1]
        chunk_scan = ps.sorted_segment_max_u32(hce, summ)
        k = t // G
        prev = jnp.maximum(k - 1, 0)
        cross = (k > 0) & (hc[t] == hce[prev])
        best = xc.reshape(Q, C)[t]
        best = jnp.where(cross[:, None],
                         jnp.maximum(best, chunk_scan[prev]), best)
        return best.astype(jnp.float32)

    t2, c2 = timeit(twolevel, headj, x, tailpos)
    print(f"two-level: {t2*1e3:7.1f} ms (+{(t2-t0)*1e3:6.1f}) "
          f"(compile {c2:.0f}s)", flush=True)

    # equality at tails
    a = np.asarray(jax.jit(full)(headj, x, tailpos))
    b = np.asarray(jax.jit(twolevel)(headj, x, tailpos))
    print("match:", bool((a == b).all()), flush=True)


if __name__ == "__main__":
    main()
