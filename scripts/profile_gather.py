"""Isolate TPU gather/conv costs to pick the conv implementation."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp

def bench(fn, *args, iters=10):
    r = fn(*args); jax.block_until_ready(r)
    for _ in range(3): float(jax.tree_util.tree_leaves(fn(*args))[0].sum())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jax.tree_util.tree_leaves(fn(*args))[0].sum())
        ts.append(time.perf_counter() - t0)
    return min(ts)

V, K = 65536, 9
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, V, size=(V, K)).astype(np.int32))
found = jnp.asarray(rng.random((V, K)) > 0.1)

for C in [64, 256]:
    x = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K*C, C)).astype(np.float32) * 0.01)
    xb = x.astype(jnp.bfloat16); wb = w.astype(jnp.bfloat16)

    g_only = jax.jit(lambda x_: x_[idx])
    print(f"C={C} gather only      : {bench(g_only, x)*1e3:8.2f} ms")
    g_mask = jax.jit(lambda x_: x_[idx] * found[..., None])
    print(f"C={C} gather+mask      : {bench(g_mask, x)*1e3:8.2f} ms")
    full = jax.jit(lambda x_, w_: jnp.dot((x_[idx] * found[..., None]).reshape(V, K*C), w_, preferred_element_type=jnp.float32))
    print(f"C={C} gather+mask+dot  : {bench(full, x, w)*1e3:8.2f} ms")
    fullb = jax.jit(lambda x_, w_: jnp.dot((x_[idx] * found[..., None]).reshape(V, K*C), w_, preferred_element_type=jnp.float32))
    print(f"C={C} bf16 variant     : {bench(fullb, xb, wb)*1e3:8.2f} ms")
    # per-tap: 9 gathers of (V, C) + 9 matmuls accumulated
    def pertap(x_, w_):
        acc = jnp.zeros((V, C), jnp.float32)
        for k in range(K):
            acc += jnp.dot(x_[idx[:, k]] * found[:, k:k+1], w_[k*C:(k+1)*C], preferred_element_type=jnp.float32)
        return acc
    print(f"C={C} per-tap          : {bench(jax.jit(pertap), x, w)*1e3:8.2f} ms")
    # take with sorted-ish indices (locality probe)
    idx_sorted = jnp.sort(idx, axis=0)
    g_sorted = jax.jit(lambda x_: x_[idx_sorted])
    print(f"C={C} gather sortedidx : {bench(g_sorted, x)*1e3:8.2f} ms")
    mm = jax.jit(lambda a, w_: jnp.dot(a, w_, preferred_element_type=jnp.float32))
    rows = (x[idx] * found[..., None]).reshape(V, K*C)
    print(f"C={C} dot only         : {bench(mm, rows, w)*1e3:8.2f} ms")
