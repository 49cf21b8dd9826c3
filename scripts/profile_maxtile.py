"""Tile-size sweep for the Pallas packed segmented-max kernel.

At C=64 the lane-packed kernel walks 2M rows in (tile/2, 128) blocks; with
tile=2048 that is 1024 sequential grid steps.  The pure HBM traffic is
<1 ms, so if the measured ~18 ms (scripts/profile_pn_sub.py scansyn) is
per-step overhead, bigger tiles should win roughly linearly until VMEM or
the in-tile log2(tile) Hillis-Steele passes bite.
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

Q = 1 << 21
C = 64


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
    hc = jnp.asarray(np.cumsum(heads).astype(np.int32))
    x = jnp.asarray(rng.integers(-2**31, 2**31, (Q, C), dtype=np.int64)
                    .astype(np.int32))

    @jax.jit
    def base(h, v):
        return h.sum() + v.sum()

    t0, _ = timeit(base, hc, x)
    print(f"base      : {t0*1e3:7.1f} ms", flush=True)
    for tile in (1024, 2048, 4096, 8192, 16384):
        fn = jax.jit(lambda h, v, t=tile: ps.sorted_segment_max_i32(
            h, v, tile=t))
        t, c = timeit(fn, hc, x)
        print(f"tile {tile:5d}: {t*1e3:7.1f} ms (+{(t-t0)*1e3:6.1f}) "
              f"(compile {c:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
