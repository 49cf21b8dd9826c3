"""Union-internals ablation: where do union0's ~55 ms and the in-union
mean's ~50 ms go?  One-dispatch prefix graphs at bench scale (2M rows).

  simplex    elevate + find_enclosing_simplex + pack only
  sort1      + stable key sort (5 operands: key, row, px, py, pz)
  birth      + head/birth segmented copy scan
  sort2      + (birth, key) re-sort (6 operands)
  scans      + the two mean scans (fwd seg-sum + bwd tail copy, 4ch)
  unsort     + final unsort sort (5 operands)
  full       _union_with_birth_and_mean (adds cumsum, table scatters, counts)
"""

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
    from temporal_latticenet_tpu.ops import permutohedral as pm
    from temporal_latticenet_tpu.ops import seq_lattice as sl
    from temporal_latticenet_tpu.ops.vertex_table import SENTINEL, pack_keys

    T, P, cap = 4, 131072, 49152
    dp1 = 4
    rng = np.random.default_rng(0)
    p, v, l, m = lidar_sequence(rng, T, P)
    positions, mask = jnp.asarray(p), jnp.asarray(m)

    def prefix_pack(positions, mask):
        elevated = pm.elevate(positions.reshape(T * P, 3), 0.6)
        keys, bary = pm.find_enclosing_simplex(elevated)
        rvalid = jnp.repeat(mask, dp1, axis=1)
        flat_keys = jnp.where(rvalid.reshape(-1)[:, None],
                              keys.reshape(T * P * dp1, 3), SENTINEL)
        cand = pack_keys(flat_keys)
        pos_rows = jnp.repeat(positions, dp1, axis=1).reshape(-1, 3)
        return cand, pos_rows, bary

    q = T * P * dp1
    per_frame = q // T

    @jax.jit
    def simplex(positions, mask):
        cand, pos_rows, _ = prefix_pack(positions, mask)
        return cand

    def do_sort1(cand, pos_rows):
        rows = jnp.arange(q, dtype=jnp.int32)
        return jax.lax.sort((cand, rows, pos_rows[:, 0], pos_rows[:, 1],
                             pos_rows[:, 2]), dimension=0, num_keys=1)

    @jax.jit
    def sort1(positions, mask):
        cand, pos_rows, _ = prefix_pack(positions, mask)
        sp, so, px, py, pz = do_sort1(cand, pos_rows)
        return sp + so.astype(jnp.uint32) + px.astype(jnp.uint32)

    def do_birth(sp, so):
        from temporal_latticenet_tpu.ops.vertex_table import PACKED_SENTINEL
        valid = sp != PACKED_SENTINEL
        head = valid & jnp.concatenate([jnp.ones((1,), bool),
                                        sp[1:] != sp[:-1]])
        br = (so // per_frame).astype(jnp.int32)
        birth = sl._seg_copy_head(head, jnp.where(valid, br, T))
        return jnp.where(valid, birth, T).astype(jnp.int32), head, valid

    @jax.jit
    def birth_fn(positions, mask):
        cand, pos_rows, _ = prefix_pack(positions, mask)
        sp, so, px, py, pz = do_sort1(cand, pos_rows)
        birth, head, valid = do_birth(sp, so)
        return birth + px.astype(jnp.int32)

    @jax.jit
    def sort2(positions, mask):
        cand, pos_rows, _ = prefix_pack(positions, mask)
        sp, so, px, py, pz = do_sort1(cand, pos_rows)
        birth, head, valid = do_birth(sp, so)
        b2, k2, so2, px2, py2, pz2 = jax.lax.sort(
            (birth.astype(jnp.uint32), sp, so, px, py, pz),
            dimension=0, num_keys=2)
        return b2 + k2 + px2.astype(jnp.uint32)

    @jax.jit
    def scans(positions, mask):
        from temporal_latticenet_tpu.ops.vertex_table import PACKED_SENTINEL
        cand, pos_rows, _ = prefix_pack(positions, mask)
        sp, so, px, py, pz = do_sort1(cand, pos_rows)
        birth, head, valid = do_birth(sp, so)
        b2, k2, so2, px2, py2, pz2 = jax.lax.sort(
            (birth.astype(jnp.uint32), sp, so, px, py, pz),
            dimension=0, num_keys=2)
        valid2 = k2 != PACKED_SENTINEL
        head2 = valid2 & jnp.concatenate([jnp.ones((1,), bool),
                                          k2[1:] != k2[:-1]])
        frame2 = (so2 // per_frame).astype(jnp.int32)
        head_vf = head2 | jnp.concatenate([jnp.ones((1,), bool),
                                           frame2[1:] != frame2[:-1]])
        tail_vf = jnp.concatenate([head_vf[1:], jnp.ones((1,), bool)])
        w2 = valid2.astype(jnp.float32)
        data = jnp.stack([px2 * w2, py2 * w2, pz2 * w2, w2], axis=1)
        tot = sl._seg_sum_rows(head_vf, data)
        return tot

    def full_default(positions, mask):
        # current (sole) path: table_tails mean + mean-derived head table
        cand, pos_rows, _ = prefix_pack(positions, mask)
        out = sl._union_with_birth_and_mean(cand, pos_rows, cap, T)
        return out[2] + out[5].sum()
    full_default = jax.jit(full_default)

    results = {}
    jobs = [("simplex", simplex), ("sort1", sort1),
            ("birth", birth_fn), ("sort2", sort2), ("scans", scans)]
    jobs.append(("full", full_default))
    for name, fn in jobs:
        t, c = timeit(fn, positions, mask)
        results[name] = t
        print(f"{name:18s}: {t*1e3:8.1f} ms  (compile {c:.0f}s)", flush=True)

    print("\nDeltas:")
    prev = 0.0
    for name, _ in jobs:
        print(f"  {name:18s}: +{(results[name]-prev)*1e3:7.1f} ms")
        prev = results[name]


if __name__ == "__main__":
    main()
