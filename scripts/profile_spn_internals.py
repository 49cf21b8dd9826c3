"""Cumulative cuts INSIDE _union_with_birth_and_mean (the +36.4 ms "spn"
stage of scripts/profile_build_split.py at bench scale).

Mirrors the union body piece by piece (same private helpers), each graph
returning tiny sums that force exactly the ops up to its cut:

  s0   sort1 + birth copy + sort2 (6 ops) + fits/fin
  s1   + head_vf/bucket + the (Q, 4) Pallas segmented sum scan
  s2   + the tail-compaction sort (6 operands)
  s3   + the (T*cap+1, 5) table scatter
  s4   + the Q-row table gather + mean2/rel2
  s5   + the 2-operand unsort + head table + counts   (= slim full)
  s6   s5 but the unsort carries the 3 rel operands   (want_row_rel cost)
  s7   s6 with +1 packed u32 riding both sorts        (pn_values cost)
  s8   s6 with +2 f32 operands riding both sorts      (the pre-pack cost)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()


def timeit(fn, *args, iters=4):
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
    from temporal_latticenet_tpu.ops import seq_lattice as sl
    from temporal_latticenet_tpu.ops.pallas_simplex import fused_simplex_pack

    T, max_pts = 4, 131072
    capacity = 49152
    rt = RuntimeConfig(max_points=max_pts, capacity_level0=capacity,
                       capacity_decay=0.5, min_capacity=8192, sigma=0.6)
    rng = np.random.default_rng(0)
    p, v, l, m = lidar_sequence(rng, T, max_pts)
    positions, mask = jnp.asarray(p), jnp.asarray(m)

    def prep(P, M):
        """Same candidate prep as build_sequence_lattice's level-0 body."""
        packed4, bary4 = fused_simplex_pack(
            P.reshape(-1, 3), M.reshape(-1), rt.sigma)
        pos_rows = jnp.repeat(P.reshape(-1, 3), 4, axis=0)
        return packed4.reshape(-1), pos_rows, bary4.reshape(-1)

    def body(P, M, cut: int, extra_mode: str = "none"):
        cand_packed, pos_rows, bary_rows = prep(P, M)
        q = cand_packed.shape[0]
        per_frame = q // T
        rows = jnp.arange(q, dtype=jnp.int32)
        if extra_mode == "packed":
            ex = tuple(sl._pack_pn_rows(pos_rows[:, :1], bary_rows)[:, i]
                       for i in range(1))
        elif extra_mode == "f32":
            ex = (pos_rows[:, 0] * 0.5, bary_rows)
        else:
            ex = ()
        sp, so, px, py, pz, *ex1 = jax.lax.sort(
            (cand_packed, rows, pos_rows[:, 0], pos_rows[:, 1],
             pos_rows[:, 2]) + ex, dimension=0, num_keys=1)
        birth_rows = (so // per_frame).astype(jnp.int32)
        valid = sp != sl.PACKED_SENTINEL
        head = valid & jnp.concatenate(
            [jnp.ones((1,), bool), sp[1:] != sp[:-1]])
        birth = sl._seg_copy_head(head, jnp.where(valid, birth_rows, T))
        birth = jnp.where(valid, birth, T).astype(jnp.int32)
        b2, k2, so2, px2, py2, pz2, *ex2 = jax.lax.sort(
            (birth.astype(jnp.uint32), sp, so, px, py, pz) + tuple(ex1),
            dimension=0, num_keys=2)
        valid2 = k2 != sl.PACKED_SENTINEL
        head2 = valid2 & jnp.concatenate(
            [jnp.ones((1,), bool), k2[1:] != k2[:-1]])
        urank2 = sl._blocked_cumsum(head2.astype(jnp.int32)) - 1
        fits = valid2 & (urank2 < capacity - 1)
        fin = jnp.where(fits, urank2 + 1, 0)
        acc = (fin.sum().astype(jnp.float32) + so2.sum().astype(jnp.float32)
               + sum(e.astype(jnp.float32).sum() for e in ex2))
        if cut == 0:
            return acc
        frame2 = (so2 // per_frame).astype(jnp.int32)
        head_vf = head2 | jnp.concatenate(
            [jnp.ones((1,), bool), frame2[1:] != frame2[:-1]])
        tail_vf = jnp.concatenate([head_vf[1:], jnp.ones((1,), bool)])
        w2 = fits.astype(jnp.float32)
        data = jnp.stack([px2 * w2, py2 * w2, pz2 * w2, w2], axis=1)
        run_tot = sl._seg_sum_rows(head_vf, data)
        bucket = jnp.where(fits, frame2 * capacity + fin, T * capacity)
        acc = acc + run_tot.sum() + bucket.sum().astype(jnp.float32)
        if cut == 1:
            return acc
        mcap = T * capacity
        posf = jnp.arange(q, dtype=jnp.float32)
        tkey = jnp.where(tail_vf & fits, bucket.astype(jnp.uint32),
                         jnp.uint32(0xFFFFFFFF))
        sk, s0_, s1_, s2_, s3_, spos = jax.lax.sort(
            (tkey, run_tot[:, 0], run_tot[:, 1], run_tot[:, 2],
             run_tot[:, 3], posf), dimension=0, num_keys=1)
        acc = acc + s0_.sum() + spos.sum()
        if cut == 2:
            return acc
        dd = jnp.where(sk[:mcap] != jnp.uint32(0xFFFFFFFF),
                       sk[:mcap].astype(jnp.int32), mcap)
        buf = jnp.zeros((mcap + 1, 5), jnp.float32).at[dd].set(
            jnp.stack([s0_[:mcap], s1_[:mcap], s2_[:mcap], s3_[:mcap],
                       spos[:mcap]], axis=1))
        acc = acc + buf.sum()
        if cut == 3:
            return acc
        tot = buf[bucket][:, :4]
        mean2 = tot[:, :3] / jnp.maximum(tot[:, 3:], 1.0)
        rel2 = (jnp.stack([px2, py2, pz2], axis=1) - mean2) * w2[:, None]
        acc = acc + rel2.sum()
        if cut == 4:
            return acc
        if cut >= 6:
            _, row_idx, rx, ry, rz = jax.lax.sort(
                (so2, fin, rel2[:, 0], rel2[:, 1], rel2[:, 2]),
                dimension=0, num_keys=1)
            acc = acc + rx.sum()
        else:
            _, row_idx = jax.lax.sort((so2, fin), dimension=0, num_keys=1)
        packed_final, birth_final = sl._head_table(
            head2, fits, urank2, k2, b2, capacity, T)
        counts = 1 + jnp.sum(
            (birth_final[None, :] <= jnp.arange(T)[:, None])
            & (packed_final != sl.PACKED_SENTINEL)[None, :],
            axis=1).astype(jnp.int32)
        return (acc + row_idx.sum().astype(jnp.float32)
                + packed_final.sum().astype(jnp.float32)
                + counts.sum().astype(jnp.float32))

    graphs = [
        ("s0_sorts", lambda P, M: body(P, M, 0)),
        ("s1_sumscan", lambda P, M: body(P, M, 1)),
        ("s2_compact", lambda P, M: body(P, M, 2)),
        ("s3_scatter", lambda P, M: body(P, M, 3)),
        ("s4_gather", lambda P, M: body(P, M, 4)),
        ("s5_full", lambda P, M: body(P, M, 5)),
        ("s6_relops", lambda P, M: body(P, M, 6)),
        ("s7_packed", lambda P, M: body(P, M, 6, "packed")),
        ("s8_2xf32", lambda P, M: body(P, M, 6, "f32")),
    ]
    prev = 0.0
    for name, fn in graphs:
        t, c = timeit(jax.jit(fn), positions, mask)
        print(f"{name:10s}: {t*1e3:8.1f} ms (+{(t-prev)*1e3:7.1f}) "
              f"(compile {c:.0f}s)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
