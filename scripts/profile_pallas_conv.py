"""A/B the Pallas VMEM gather+matmul conv against the XLA gather path."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


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
    from temporal_latticenet_tpu.ops.pallas_conv import (
        lattice_conv_gather_matmul, fits_vmem)

    rng = np.random.default_rng(0)
    for c, cin, cout in [(49152, 64, 64), (24576, 128, 128),
                         (12288, 256, 256), (98304, 64, 64)]:
        k = 9
        vals = jnp.asarray(rng.normal(size=(c, cin)).astype(np.float32)
                           ).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, c, (c, k)).astype(np.int32))
        w = jnp.asarray(rng.normal(size=(k * cin, cout)).astype(np.float32))
        wb = w.astype(jnp.bfloat16)

        @jax.jit
        def xla8(v):
            for _ in range(8):
                v = jnp.dot(v[idx].reshape(c, k * cin), wb,
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            return v

        @jax.jit
        def pallas8(v):
            for _ in range(8):
                v = lattice_conv_gather_matmul(v, idx, w).astype(jnp.bfloat16)
            return v

        a = np.asarray(xla8(vals), np.float32)
        b = np.asarray(pallas8(vals), np.float32)
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        tx, cx = timeit(xla8, vals)
        tp, cp = timeit(pallas8, vals)
        print(f"C={c:6d} Cin={cin:3d}: xla {tx/8*1e3:6.2f} ms/conv  "
              f"pallas {tp/8*1e3:6.2f} ms/conv  (rel err {err:.1e}, "
              f"fits={fits_vmem(c, cin)}, compile {cx:.0f}/{cp:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
