"""Whole-sequence lattice construction: one birth-tagged union per level.

The streaming path (``lattice_ops.distribute`` + ``grow_coarse_table`` per
frame) rebuilds tables, neighbor tables and level links every frame even
though consecutive LiDAR scans share ~90% of their vertices; on-TPU ablation
showed this table work at ~50% of sequence time.  Since training and offline
evaluation see all T frames of a sequence at once (train_ln.py:160-175 loads
the whole window), the lattice for the WHOLE sequence can be built in one
pass:

* every vertex gets a ``birth`` frame (first frame whose cloud touches it);
* stable indices are assigned sorted by (birth, packed key), which makes the
  per-frame vertex set exactly the prefix [0, counts[t]) -- the same
  append-only growth the reference's un-reset hashmap produces
  (models.py:286-289), so hidden-state padding semantics are unchanged;
* neighbor tables and coarse-level links are built ONCE against the final
  vertex set; frame-t validity is just ``birth[idx] <= t``.

Streaming inference keeps the per-frame path; ``engine.make_sequence_forward``
uses this one.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from . import permutohedral as pm
from .vertex_table import (PACKED_SENTINEL, SENTINEL, pack_keys, unpack_keys)
from .mxu_lookup import mxu_lookup_select
from .lattice_ops import LevelLink, NeighborTable
from .lattice_ops import augment_link_sorted as lo_augment_link_sorted


@flax.struct.dataclass
class SeqLevel:
    """One lattice level, finalised for the whole sequence."""

    keys: jax.Array        # (C, 3) int32, birth-then-packed order; row 0 reserved
    birth: jax.Array       # (C,) int32 frame of first appearance (T for unused)
    counts: jax.Array      # (T,) int32 occupied slots (incl. slot 0) at frame t
    nbr_idx: jax.Array     # (C, 9) int32 one-hop neighbors in the FINAL set
    nbr_found: jax.Array   # (C, 9) bool existence in the final set
    nbr_birth: jax.Array   # (C, 9) int32 neighbor birth (T where absent)


@flax.struct.dataclass
class SortedPN:
    """Union-sorted-order pointnet inputs (the r3 batched fast path).

    The per-frame pointnet's segment_max scatter costs ~8 ms/frame; in the
    union's (birth, key)-sorted order every (vertex, frame) bucket is a
    CONTIGUOUS sub-run, so the max becomes one blocked segmented max-scan
    over all T frames at once, with the per-bucket result sitting at the
    sub-run tail.  These arrays let the model run its MLP directly on
    sorted rows and extract (T, cap, C) results by one small gather.
    """

    rel: jax.Array       # (Q, 3) f32 rel-to-local-mean positions, sorted
    so: jax.Array        # (Q,) int32 original row id per sorted row
    live: jax.Array      # (Q,) bool row lands in a real vertex slot
    head_vf: jax.Array   # (Q,) bool (vertex, frame) sub-run head flags
    bucket: jax.Array    # (Q,) int32 frame*cap + vertex slot (T*cap if dead)
    tailpos: jax.Array   # (T, cap) int32 sorted position of bucket tail
    # point values + barycentric weights pre-carried through the union's
    # sorts (r3: rides ceil((v+1)/2) packed uint32 operands instead of the
    # pointnet's (Q, v+1)-row gather by ``so``).  Bit-identical downstream:
    # the MLP casts values to bf16 anyway and the packed segment max
    # quantises bary to 1/65535 anyway, so packing (bf16 bits, u16 bary)
    # BEFORE the sorts loses nothing.  None without ``pn_values``.
    vals: jax.Array | None = None   # (Q, v) bf16, sorted, UNmasked
    bary: jax.Array | None = None   # (Q,) f32 (1/65535 grid), sorted
    # (vertex, frame) sub-run ids (inclusive cumsum of head_vf), shared
    # with segment.sorted_packed_max so the max scan skips its own
    # _blocked_cumsum pass.
    head_count: jax.Array | None = None   # (Q,) int32


@flax.struct.dataclass
class SeqLattice:
    """All levels plus the per-frame distribute outputs at level 0."""

    levels: Tuple[SeqLevel, ...]
    links: Tuple[LevelLink, ...]      # fine->coarse couplings, len = L
    row_vertex: jax.Array             # (T, P*4) int32
    row_bary: jax.Array               # (T, P*4) f32
    row_valid: jax.Array              # (T, P*4) bool
    row_rel_pos: jax.Array            # (T, P*4, 3) f32
    point_vertex: jax.Array           # (T, P, 4) int32
    point_bary: jax.Array             # (T, P, 4) f32
    nr_points: jax.Array | None = None  # (T, C0) f32 valid rows per vertex
    sorted_pn: "SortedPN | None" = None

    def frame_nbr(self, level: int, t) -> NeighborTable:
        """Neighbor table as visible at frame t (unborn neighbors absent)."""
        lv = self.levels[level]
        found = lv.nbr_found & (lv.nbr_birth <= t)
        return NeighborTable(idx=lv.nbr_idx, found=found)


def _blocked_seg_scan(comb, head: jax.Array, val: jax.Array,
                      block: int = 128):
    """Two-level segmented inclusive scan, numerically identical to
    ``jax.lax.associative_scan(comb, (head, val))``.

    XLA's associative_scan makes ~log2(Q) full passes over the operands
    (measured 16.5 ms for a (bool, 4ch f32) scan at Q=2M vs a ~2 ms
    traffic roofline, scripts/profile_union.py).  Splitting Q into
    (Q/block, block) scans only log2(block) passes over the data: inner
    scan along the block axis, a negligible carry scan over Q/block block
    tails, and one elementwise fix-up combining each block's carry-in.
    Block 0 keeps its inner result (the carry identity is not expressible
    for non-monoid combines like head-copy).
    """
    q = head.shape[0]
    nb = q // block
    if nb * block != q or nb < 2:
        _, out = jax.lax.associative_scan(comb, (head, val))
        return out
    h = head.reshape(nb, block)
    v = val.reshape(nb, block, *val.shape[1:])
    fi, vi = jax.lax.associative_scan(comb, (h, v), axis=1)
    fc, vc = jax.lax.associative_scan(comb, (fi[:, -1], vi[:, -1]), axis=0)
    f_in = jnp.roll(fc, 1, axis=0)
    v_in = jnp.roll(vc, 1, axis=0)
    ff, vf = comb((f_in[:, None], v_in[:, None]), (fi, vi))
    first = jnp.arange(nb)[:, None] == 0
    out = jnp.where(jnp.reshape(first, first.shape + (1,) * (val.ndim - 1)),
                    vi, vf)
    return out.reshape(val.shape)


def _blocked_cumsum(x: jax.Array, block: int = 128) -> jax.Array:
    """Blocked 1-D cumsum: log2(block) data passes instead of log2(Q)
    (same rationale as :func:`_blocked_seg_scan`); ONE pass via the Pallas
    scan kernel on accelerators (ids all-zero = a single run)."""
    q = x.shape[0]
    if _use_pallas_scans() and q >= 1 << 16:
        from . import pallas_scan as ps
        ids = jnp.zeros((q,), jnp.int32)
        return ps.sorted_segment_scan(ids, x[:, None], "sum")[:, 0]
    nb = q // block
    if nb * block != q or nb < 2:
        return jnp.cumsum(x)
    inner = jnp.cumsum(x.reshape(nb, block), axis=1)
    carry = jnp.roll(jnp.cumsum(inner[:, -1]), 1).at[0].set(0)
    return (inner + carry[:, None]).reshape(q)


def _use_pallas_scans() -> bool:
    """One-pass Pallas segmented scans on accelerators; the blocked
    associative_scan fallback elsewhere (CPU tests, interpreters).
    TLN_PALLAS_SCANS=0 forces the fallback everywhere (A/B knob)."""
    import os
    if os.environ.get("TLN_PALLAS_SCANS", "1") == "0":
        return False
    return jax.default_backend() not in ("cpu",)


def _use_pallas_simplex() -> bool:
    """Fused elevate+simplex+pack kernel (ops/pallas_simplex.py) on
    accelerators; bit-exact with the jnp path (tested), gated separately
    for A/B (TLN_PALLAS_SIMPLEX=0)."""
    import os
    if os.environ.get("TLN_PALLAS_SIMPLEX", "1") == "0":
        return False
    return jax.default_backend() not in ("cpu",)


def _seg_copy_head(head: jax.Array, val: jax.Array) -> jax.Array:
    """Propagate each run head's value across its (contiguous) run.

    Standard segmented scan: result[i] = val at the last head position <= i.
    """
    if _use_pallas_scans():
        from . import pallas_scan as ps
        ids = _blocked_cumsum(head.astype(jnp.int32))
        return ps.sorted_segment_scan(ids, val[:, None], "first")[:, 0]

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)
    return _blocked_seg_scan(comb, head, val)


def _seg_sum_rows(head: jax.Array, val: jax.Array) -> jax.Array:
    """Segmented inclusive row sum: resets where ``head``.  val (Q, K)."""
    if _use_pallas_scans():
        from . import pallas_scan as ps
        ids = _blocked_cumsum(head.astype(jnp.int32))
        return ps.sorted_segment_scan(ids, val, "sum")

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb[..., None], vb, va + vb)
    return _blocked_seg_scan(comb, head, val)


def _head_table(head2, fits, urank2, k2, b2, capacity: int, n_frames: int):
    """Capacity-sized (packed, birth) tables from the run heads of the
    (birth, key)-sorted candidates.  Slot 0 is the reserved invalid bucket.

    Stable-sorts heads to the front in rank order, slices the first
    capacity-1, masks ranks past the true head count: one more (cheap)
    multi-operand sort instead of a serial per-row scatter (A/B'd r2;
    scatters are ~15-30 ns per source row while 2M-row sorts are ~2-3 ms).
    Used by the no-mean path; the mean path derives its head table from
    the mean tables (see _union_with_birth_and_mean).
    """
    hkey = jnp.where(head2 & fits, urank2.astype(jnp.uint32),
                     jnp.uint32(0xFFFFFFFF))
    _, kk, bb = jax.lax.sort((hkey, k2, b2.astype(jnp.uint32)),
                             dimension=0, num_keys=1)
    if kk.shape[0] < capacity - 1:
        # fewer candidate rows than table slots (tiny configs): pad to the
        # table size so the where() below broadcasts
        pad = capacity - 1 - kk.shape[0]
        kk = jnp.concatenate([kk, jnp.full((pad,), PACKED_SENTINEL,
                                           jnp.uint32)])
        bb = jnp.concatenate([bb, jnp.full((pad,), n_frames, jnp.uint32)])
    n_heads = jnp.minimum(urank2[-1] + 1, capacity - 1)
    rank = jnp.arange(capacity - 1, dtype=jnp.int32)
    live = rank < n_heads
    packed_final = jnp.concatenate(
        [jnp.full((1,), PACKED_SENTINEL, jnp.uint32),
         jnp.where(live, kk[: capacity - 1], PACKED_SENTINEL)])
    birth_final = jnp.concatenate(
        [jnp.full((1,), n_frames, jnp.int32),
         jnp.where(live, bb[: capacity - 1].astype(jnp.int32), n_frames)])
    return packed_final, birth_final


def _pack_pn_rows(vals_rows: jax.Array, bary_rows: jax.Array) -> jax.Array:
    """Pack per-row point values + barycentric weight into uint32 sort
    operands: 16-bit units [bf16(val_0) .. bf16(val_{v-1}), u16(bary)]
    (zero-padded to even), two units per uint32 (hi first).

    bf16 value bits because the pointnet MLP consumes values at bf16;
    bary quantised to 1/65535 because ``segment._pack_value_bary`` does
    exactly that (idempotent re-quantisation) -- so riding packed is
    bit-identical to riding f32.
    """
    q, v = vals_rows.shape
    units = [jax.lax.bitcast_convert_type(
        vals_rows[:, i].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        for i in range(v)]
    units.append((jnp.clip(bary_rows, 0.0, 1.0) * 65535.0
                  + 0.5).astype(jnp.uint32))
    if len(units) % 2:
        units.append(jnp.zeros((q,), jnp.uint32))
    cols = [(units[2 * j] << 16) | (units[2 * j + 1] & jnp.uint32(0xFFFF))
            for j in range(len(units) // 2)]
    return jnp.stack(cols, axis=1)


def _unpack_pn_rows(cols, n_vals: int):
    """Inverse of :func:`_pack_pn_rows` on already-sorted uint32 columns.
    Returns ((Q, v) bf16 values, (Q,) f32 bary on the 1/65535 grid)."""
    units = []
    for col in cols:
        units.append((col >> 16).astype(jnp.uint16))
        units.append((col & jnp.uint32(0xFFFF)).astype(jnp.uint16))
    vals = jnp.stack(
        [jax.lax.bitcast_convert_type(units[i], jnp.bfloat16)
         for i in range(n_vals)], axis=1)
    bary = units[n_vals].astype(jnp.float32) / 65535.0
    return vals, bary


def _union_with_birth(cand_packed: jax.Array, cand_order: jax.Array,
                      capacity: int, n_frames: int):
    """Assign birth-ordered stable indices to unique candidate keys.

    Args:
      cand_packed: (Q,) uint32 (PACKED_SENTINEL for invalid rows).
      cand_order:  (Q,) int32 monotone-in-frame priority (the stable key-sort
        keeps rows of a key run in original order, so the run head -- the
        earliest row -- determines the birth: ``cand_order // per_frame``).
      capacity: target table size (slot 0 reserved).

    Returns (packed_final (C,), birth (C,), row_idx (Q,), counts (T,)).

    Design (v2, profile-driven): the TPU cost here is not the sorts
    (~2.6 ms per 2M-row stable sort) but per-row random access -- the v1
    implementation paid a 2M element-gather (~15 ms) plus an
    inverse-permutation scatter (~10 ms) to remap rows through a compacted
    unique buffer.  v2 instead (a) propagates birth along sorted runs with a
    segmented scan, (b) re-sorts rows by (birth, key) so the final index IS
    the unique-run rank (no remap), and (c) returns to original row order by
    sorting on the carried row id -- sorts replace every random-access pass.
    """
    q = cand_packed.shape[0]
    per_frame = q // n_frames
    sp, so = jax.lax.sort((cand_packed, cand_order), dimension=0, num_keys=1)
    birth_rows = (so // per_frame).astype(jnp.int32)
    return _finish_union(sp, so, birth_rows, capacity, n_frames)


def _union_with_birth_and_mean(cand_packed: jax.Array, pos_rows: jax.Array,
                               capacity: int, n_frames: int,
                               extra_rows: jax.Array | None = None,
                               n_vals: int = 0,
                               skip_rel_unsort: bool = False):
    """Level-0 union that also computes each row's position relative to its
    per-(vertex, frame) mean INSIDE the union's own sorted order.

    The reference's distribute subtracts the per-vertex mean of the current
    frame's contributing points (scatter_mean over indices, cf.
    /root/reference/seq_lattice/models.py:452-454).  Doing this with
    per-frame segment_sum + gather costs ~103 ms at bench scale (profiled,
    scripts/profile_r2.py) because scatters/gathers are index-bound on TPU.
    Here positions ride the two sorts the union performs anyway; within a
    key run rows are frame-ordered, so per-(key, frame) sub-run sums come
    from one forward segmented scan, are broadcast back by one backward
    scan, and the relative positions return to original row order on the
    unsort the union also already performs.  Net extra cost: two scans and
    three extra sort operands instead of two full scatter/gather passes.

    Args:
      cand_packed: (Q,) uint32, frame-major row order (PACKED_SENTINEL for
        invalid rows), Q = n_frames * per_frame.
      pos_rows: (Q, 3) f32 point position per candidate row.

    Returns (packed_final (C,), birth (C,), row_idx (Q,), counts (T,),
             rel (Q, 3) f32 original order, nr_points (T, C) f32).
    """
    q = cand_packed.shape[0]
    per_frame = q // n_frames
    rows = jnp.arange(q, dtype=jnp.int32)
    n_extra = 0 if extra_rows is None else extra_rows.shape[1]
    ex_cols = () if extra_rows is None else tuple(
        extra_rows[:, i] for i in range(n_extra))
    sp, so, px, py, pz, *ex1 = jax.lax.sort(
        (cand_packed, rows, pos_rows[:, 0], pos_rows[:, 1], pos_rows[:, 2])
        + ex_cols, dimension=0, num_keys=1)
    birth_rows = (so // per_frame).astype(jnp.int32)

    valid = sp != PACKED_SENTINEL
    head = valid & jnp.concatenate([jnp.ones((1,), bool), sp[1:] != sp[:-1]])
    birth = _seg_copy_head(head, jnp.where(valid, birth_rows, n_frames))
    birth = jnp.where(valid, birth, n_frames).astype(jnp.int32)

    b2, k2, so2, px2, py2, pz2, *ex2 = jax.lax.sort(
        (birth.astype(jnp.uint32), sp, so, px, py, pz) + tuple(ex1),
        dimension=0, num_keys=2)
    valid2 = k2 != PACKED_SENTINEL
    head2 = valid2 & jnp.concatenate([jnp.ones((1,), bool), k2[1:] != k2[:-1]])
    urank2 = _blocked_cumsum(head2.astype(jnp.int32)) - 1
    fits = valid2 & (urank2 < capacity - 1)
    fin = jnp.where(fits, urank2 + 1, 0)

    # per-(vertex, frame) sub-runs: rows of a key run are frame-ordered
    # because the stable sorts keep so ascending within equal (birth, key)
    frame2 = (so2 // per_frame).astype(jnp.int32)
    head_vf = head2 | jnp.concatenate(
        [jnp.ones((1,), bool), frame2[1:] != frame2[:-1]])
    tail_vf = jnp.concatenate([head_vf[1:], jnp.ones((1,), bool)])
    w2 = fits.astype(jnp.float32)
    data = jnp.stack([px2 * w2, py2 * w2, pz2 * w2, w2], axis=1)
    bucket = jnp.where(fits, frame2 * capacity + fin,
                       n_frames * capacity)
    # Per-(vertex, frame) mean via "table_tails" (the r3 winner of the
    # measured ladder scan -> table -> table_bwd -> table_compact ->
    # table_tails; losers deleted r4 per VERDICT item 6, history in
    # CLAUDE.md).  The run totals are only ever read at TAIL rows, so the
    # full inclusive (Q, 4) scan (+16.3 ms at bench scale,
    # scripts/profile_spn_internals.py) shrinks to a lane-only chunk scan
    # + a (Q/32)-row summary chain + gathers at the compacted tail
    # positions (ps.seg_sum_tails).  The compaction sort carries only
    # 2 operands (tkey, posf) because the sums arrive by gather instead
    # of riding the sort; the scatter into the (T*cap+1, 5) table costs
    # per SOURCE row, and only ~T*cap of the Q rows are tails.
    m = n_frames * capacity
    posf = jnp.arange(q, dtype=jnp.float32)
    tkey = jnp.where(tail_vf & fits, bucket.astype(jnp.uint32),
                     jnp.uint32(0xFFFFFFFF))
    sk, spos = jax.lax.sort((tkey, posf), dimension=0, num_keys=1)
    if q < m:
        pad = m - q
        sk = jnp.concatenate([sk, jnp.full((pad,), 0xFFFFFFFF,
                                           jnp.uint32)])
        spos = jnp.concatenate([spos, jnp.zeros((pad,), jnp.float32)])
    dd = jnp.where(sk[:m] != jnp.uint32(0xFFFFFFFF),
                   sk[:m].astype(jnp.int32), m)
    tails_i = spos[:m].astype(jnp.int32)
    ids_vf = _blocked_cumsum(head_vf.astype(jnp.int32))
    if _use_pallas_scans():
        from . import pallas_scan as ps
        tail_sums = ps.seg_sum_tails(ids_vf, data, tails_i)
    else:
        tail_sums = _seg_sum_rows(head_vf, data)[tails_i]
    buf = jnp.zeros((m + 1, 5), jnp.float32).at[dd].set(
        jnp.concatenate([tail_sums, spos[:m, None]], axis=1))
    tot = buf[bucket][:, :4]
    nr_points = buf[:m, 3].reshape(n_frames, capacity)
    tailpos = buf[:m, 4].astype(jnp.int32).reshape(n_frames, capacity)
    mean2 = tot[:, :3] / jnp.maximum(tot[:, 3:], 1.0)
    rel2 = (jnp.stack([px2, py2, pz2], axis=1) - mean2) * w2[:, None]
    nr_points = nr_points.at[:, 0].set(0.0)

    # back to original row order on the unsort the union needs anyway.
    # When the caller's pointnet consumes the SORTED rel (the batched
    # path reads SortedPN.rel; row_rel_pos has no other consumer), the
    # unsort drops its three rel operands (~1.2 ms per 2M-row operand).
    if skip_rel_unsort:
        _, row_idx = jax.lax.sort((so2, fin), dimension=0, num_keys=1)
        rel = jnp.zeros((q, 3), jnp.float32)
    else:
        _, row_idx, rx, ry, rz = jax.lax.sort(
            (so2, fin, rel2[:, 0], rel2[:, 1], rel2[:, 2]),
            dimension=0, num_keys=1)
        rel = jnp.stack([rx, ry, rz], axis=1)

    # r3: the head table falls out of the mean tables.  A slot's birth
    # is the first frame with points (``fits`` is uniform across a key
    # run -- the whole run fits or none of it does -- so the earliest
    # row counted in nr_points IS the run head's frame), and
    # tailpos[birth, s] is a sorted row position inside that slot
    # whose k2 is the slot's key.  (T, cap) elementwise ops + one
    # cap-row gather replace _head_table's 3-operand Q-row sort.
    # Column 0 of nr_points is already zeroed (reserved bucket), so
    # slot 0 falls out as (PACKED_SENTINEL, n_frames) like the table.
    nz = nr_points > 0.0                      # (T, cap)
    any_slot = nz.any(axis=0)
    bf = jnp.argmax(nz, axis=0).astype(jnp.int32)
    rep = tailpos[bf, jnp.arange(capacity, dtype=jnp.int32)]
    packed_final = jnp.where(any_slot, k2[rep], PACKED_SENTINEL)
    birth_final = jnp.where(any_slot, bf, n_frames)

    counts = 1 + jnp.sum(
        (birth_final[None, :] <= jnp.arange(n_frames)[:, None])
        & (packed_final != PACKED_SENTINEL)[None, :], axis=1).astype(jnp.int32)
    pn_vals = pn_bary = None
    if n_extra:
        pn_vals, pn_bary = _unpack_pn_rows(ex2, n_vals)
    sorted_pn = SortedPN(
        rel=rel2, so=so2, live=fits, head_vf=head_vf, bucket=bucket,
        tailpos=tailpos, vals=pn_vals, bary=pn_bary,
        head_count=ids_vf)
    return packed_final, birth_final, row_idx, counts, rel, nr_points, \
        sorted_pn


def _finish_union(sp, so, birth_rows, capacity: int, n_frames: int):
    """Shared tail of both union variants; ``sp``/``so``/``birth_rows`` are
    the stable key-sorted candidates (birth monotone within runs, so the run
    head carries the minimum)."""
    q = sp.shape[0]
    valid = sp != PACKED_SENTINEL
    head = valid & jnp.concatenate([jnp.ones((1,), bool), sp[1:] != sp[:-1]])
    birth = _seg_copy_head(head, jnp.where(valid, birth_rows, n_frames))
    birth = jnp.where(valid, birth, n_frames).astype(jnp.int32)

    # Final order: (birth, key); key runs stay contiguous because a key has
    # exactly one birth.  Sentinels (birth=T, key=max) sort last.  Overflow
    # (unique rank >= capacity-1) drops youngest-then-largest -- identical to
    # the streaming table's append-order drops.
    b2, k2, so2 = jax.lax.sort((birth.astype(jnp.uint32), sp, so),
                               dimension=0, num_keys=2)
    valid2 = k2 != PACKED_SENTINEL
    head2 = valid2 & jnp.concatenate([jnp.ones((1,), bool), k2[1:] != k2[:-1]])
    urank2 = _blocked_cumsum(head2.astype(jnp.int32)) - 1
    fits = valid2 & (urank2 < capacity - 1)
    fin = jnp.where(fits, urank2 + 1, 0)

    # Back to original row order: one more sort instead of an
    # inverse-permutation scatter (2.6 ms vs ~10 ms at 2M rows).
    _, row_idx = jax.lax.sort((so2, fin), dimension=0, num_keys=1)

    packed_final, birth_final = _head_table(head2, fits, urank2, k2, b2,
                                            capacity, n_frames)

    counts = 1 + jnp.sum(
        (birth_final[None, :] <= jnp.arange(n_frames)[:, None])
        & (packed_final != PACKED_SENTINEL)[None, :], axis=1).astype(jnp.int32)
    return packed_final, birth_final, row_idx, counts


def _merge_lookup(sorted_packed: jax.Array, q: jax.Array) -> jax.Array:
    """(Q,) packed queries -> positions in ``sorted_packed`` or -1.

    ``sorted_packed`` must be ascending (sentinels last)."""
    n_t = sorted_packed.shape[0]
    n_q = q.shape[0]
    keys = jnp.concatenate([sorted_packed, q])
    payload = jnp.concatenate([jnp.arange(n_t, dtype=jnp.int32),
                               jnp.arange(n_q, dtype=jnp.int32) + n_t])
    sk, sp = jax.lax.sort((keys, payload), dimension=0, num_keys=2)
    is_table = sp < n_t
    pos = jnp.arange(n_t + n_q, dtype=jnp.int32)
    last_tpos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_table, pos, -1))
    same = (last_tpos >= 0) & (sk[jnp.maximum(last_tpos, 0)] == sk)
    found = jnp.where(same, sp[jnp.maximum(last_tpos, 0)], -1)
    found = jnp.where(sk == PACKED_SENTINEL, -1, found)
    return jnp.full((n_q,), -1, jnp.int32).at[
        jnp.where(is_table, n_q, sp - n_t)].set(found, mode="drop")


def _build_level(packed_final, birth_final, counts, n_frames,
                 nbr_rows: int | None = None):
    """Neighbor structure for a finalised level.

    NOTE: indices are in birth-then-packed order, so the table is NOT
    globally packed-sorted; lookups sort internally (merge lookup).

    ``nbr_rows`` (static, <= capacity) restricts the neighbor tables to the
    [0, nbr_rows) row prefix -- fewer lookup queries and a smaller inverse
    scatter.  Sound whenever every REAL vertex has index < nbr_rows (the
    engine passes max(trim, final) capacities, whose undersizing is already
    surfaced as trim_overflow): rows past nbr_rows are then dead slots
    whose queries could only produce dead edges.  The full-capacity
    ``keys``/``birth`` stay intact for the coarse-level candidate pass.
    """
    cap = packed_final.shape[0]
    keys = unpack_keys(packed_final)
    nr = cap if nbr_rows is None else min(nbr_rows, cap)

    # One-hop offsets come in +/- pairs ([+o_0..+o_d, -o_0..-o_d],
    # pm.neighbor_offsets): if B = A + o_a then A = B - o_a, so only the
    # POSITIVE half is looked up and the negative half is its scatter
    # inverse -- half the MXU-lookup volume for one nr*4-row scatter
    # (lookups dominated the nbr stage, scripts/profile_build_split.py).
    offs = jnp.asarray(pm.neighbor_offsets(3))
    n_half = offs.shape[0] // 2
    queries = (keys[:nr, None, :] + offs[None, :n_half, :]
               ).reshape(nr * n_half, 3)
    qpacked = pack_keys(queries)
    # Sort the table once, then batched MXU lookups (no random gathers).
    # Stable index and birth ride the SAME one-hot contraction as payload
    # byte-planes, killing the two follow-up (C*9)-element random gathers.
    stable = jnp.arange(cap, dtype=jnp.int32)
    s_packed, s_stable, s_birth = jax.lax.sort(
        (packed_final, stable, birth_final), dimension=0, num_keys=1)
    pos, (st, bi) = mxu_lookup_select(
        s_packed, qpacked, payloads=(s_stable, s_birth),
        payload_bits=(max(int(cap - 1).bit_length(), 1), 8))
    pos = pos.reshape(nr, n_half)
    valid_self = packed_final[:nr] != PACKED_SENTINEL
    fwd_found = (pos >= 0) & valid_self[:, None]
    fwd_idx = jnp.where(fwd_found, st.reshape(nr, n_half), -1)
    fwd_birth = bi.reshape(nr, n_half)

    # reverse edges: nbr[B, n_half + a] = A wherever nbr[A, a] = B.  A's
    # stable index (< 2^24) and birth pack into one int32 so ONE scatter
    # carries both; each (B, a) slot has at most one writer (A = B - o_a
    # is unique), and -1 marks empty slots.  Hits past the prefix (only
    # possible when nbr_rows undersizes, which is flagged upstream) drop.
    a_idx = jnp.broadcast_to(
        jnp.arange(n_half, dtype=jnp.int32)[None, :], (nr, n_half))
    dstf = jnp.where(fwd_found & (fwd_idx < nr),
                     fwd_idx * n_half + a_idx, nr * n_half)
    src = jnp.broadcast_to(
        stable[:nr, None] | (birth_final[:nr, None] << 24), (nr, n_half))
    # XLA set-scatter (~30 ns per source row): A/B'd r3 against a
    # sort-based dense placement (place_by_sort, deleted r4) at bench
    # scale -- scatter 100.3 ms vs sort 102.2 ms whole-graph; these
    # scatters have few source rows relative to a sort's volume.
    buf = jnp.full((nr * n_half + 1,), -1, jnp.int32).at[
        dstf.reshape(-1)].set(src.reshape(-1))
    rev = buf[: nr * n_half].reshape(nr, n_half)
    rev_found = (rev >= 0) & valid_self[:, None]
    rev_idx = jnp.where(rev_found, rev & 0xFFFFFF, -1)
    rev_birth = rev >> 24

    self_idx = jnp.arange(nr, dtype=jnp.int32)
    idx = jnp.concatenate([jnp.maximum(fwd_idx, 0), jnp.maximum(rev_idx, 0),
                           self_idx[:, None]], axis=1)
    found = jnp.concatenate([fwd_found, rev_found, valid_self[:, None]],
                            axis=1)
    all_birth = jnp.concatenate([fwd_birth, rev_birth,
                                 birth_final[:nr, None]], axis=1)
    nbr_birth = jnp.where(found, all_birth, n_frames)

    return SeqLevel(keys=keys, birth=birth_final, counts=counts,
                    nbr_idx=idx, nbr_found=found, nbr_birth=nbr_birth), \
        (s_packed, s_stable)


def build_sequence_lattice(positions: jax.Array, mask: jax.Array, sigma,
                           capacities, nr_downsamples: int,
                           subtract_local_mean: bool = True,
                           nbr_caps=None,
                           pn_values: jax.Array | None = None,
                           want_row_rel: bool = True) -> SeqLattice:
    """Args:
      positions: (T, P, 3) f32 padded frames.
      mask: (T, P) bool.
      capacities: per-level static table sizes.
      nbr_caps: optional per-level neighbor-table row prefixes (see
        ``_build_level``); the engine passes max(trim, final) capacities
        when every model apply consumes trimmed views.
      pn_values: optional (T, P, v) f32 point values; when given (and the
        mean path is on) they ride the union's sorts together with the
        barycentric weights -- packed into ceil((v+1)/2) uint32 operands
        (see ``_pack_pn_rows``) -- so the batched pointnet reads
        ``sorted_pn.vals``/``.bary`` instead of paying a (Q, v+1)-row
        gather by ``so`` (bit-identical downstream: the MLP casts values
        to bf16 and the packed max quantises bary to 1/65535 anyway).
      want_row_rel: pass False when no consumer reads ``row_rel_pos``
        (the batched pointnet reads the SORTED rel); the union's unsort
        then drops its three rel operands and ``row_rel_pos`` is zeros.

    Returns a SeqLattice with all levels finalised and per-frame distribute
    outputs (matching ``lattice_ops.distribute``'s row semantics per frame).
    """
    t_frames, p, _ = positions.shape
    dp1 = 4
    cap0 = capacities[0]

    rvalid = jnp.repeat(mask, dp1, axis=1)                 # (T, P*4)
    sigma_static = not isinstance(sigma, jax.core.Tracer)
    if _use_pallas_simplex() and sigma_static:
        # one fused pass: no (T*P, 4, 3) keys tensor, no separate pack
        from .pallas_simplex import fused_simplex_pack
        packed4, bary4 = fused_simplex_pack(
            positions.reshape(t_frames * p, 3), mask.reshape(-1), sigma)
        cand_packed = packed4.reshape(-1)
        bary = bary4.reshape(t_frames, p * dp1)
    else:
        elevated = pm.elevate(positions.reshape(t_frames * p, 3), sigma)
        keys, bary = pm.find_enclosing_simplex(elevated)   # (T*P, 4, 3)
        keys = keys.reshape(t_frames, p * dp1, 3)
        bary = bary.reshape(t_frames, p * dp1)

        flat_keys = jnp.where(rvalid.reshape(-1)[:, None],
                              keys.reshape(-1, 3), SENTINEL)
        cand_packed = pack_keys(flat_keys)
    pos_rows = jnp.repeat(positions, dp1, axis=1)          # (T, P*4, 3)

    if subtract_local_mean:
        # positions ride the union's sorts; the per-(vertex, frame) mean
        # comes from segmented scans instead of scatter/gather passes
        # (103 -> ~25 ms at bench scale, scripts/profile_r2.py)
        extra_rows = None
        n_vals = 0
        if pn_values is not None:
            n_vals = pn_values.shape[-1]
            vals_rows = jnp.repeat(
                pn_values.reshape(t_frames * p, n_vals), dp1, axis=0)
            extra_rows = _pack_pn_rows(vals_rows, bary.reshape(-1))
        packed0, birth0, row_idx, counts0, rel_flat, nr_points, sorted_pn \
            = _union_with_birth_and_mean(cand_packed,
                                         pos_rows.reshape(-1, 3),
                                         cap0, t_frames,
                                         extra_rows=extra_rows,
                                         n_vals=n_vals,
                                         skip_rel_unsort=not want_row_rel)
        rel = rel_flat.reshape(t_frames, p * dp1, 3)
        row_vertex = row_idx.reshape(t_frames, p * dp1)
        row_valid = rvalid & (row_vertex > 0)
    else:
        cand_order = jnp.arange(t_frames * p * dp1, dtype=jnp.int32)
        packed0, birth0, row_idx, counts0 = _union_with_birth(
            cand_packed, cand_order, cap0, t_frames)
        row_vertex = row_idx.reshape(t_frames, p * dp1)
        row_valid = rvalid & (row_vertex > 0)
        rel = pos_rows * row_valid[..., None].astype(jnp.float32)
        nr_points = None
        sorted_pn = None
    row_bary = jnp.where(row_valid, bary, 0.0)

    levels = []
    links = []
    nbr0 = None if nbr_caps is None else nbr_caps[0]
    lvl0, _ = _build_level(packed0, birth0, counts0, t_frames, nbr0)
    levels.append(lvl0)

    packed_f, birth_f = packed0, birth0
    for l in range(nr_downsamples):
        cap_f = capacities[l]
        cap_c = capacities[l + 1]
        keys_f = unpack_keys(packed_f).astype(jnp.float32)
        valid_f = packed_f != PACKED_SENTINEL
        full = jnp.concatenate([keys_f, -keys_f.sum(-1, keepdims=True)], -1)
        ckeys, cbary = pm.find_enclosing_simplex(full * 0.5)  # (Cf, 4, 3)

        flat_c = jnp.where(jnp.repeat(valid_f, dp1)[:, None],
                           ckeys.reshape(-1, 3), SENTINEL)
        cpacked = pack_keys(flat_c)
        # candidate order: fine stable index major => birth-major, because
        # fine indices are already sorted by birth
        corder = jnp.arange(cap_f * dp1, dtype=jnp.int32)
        # births map through fine birth: emulate per-frame rows by scaling
        # order so that `order // per_frame` equals the fine birth
        # (use explicit birth instead of the order trick):
        packed_c, birth_c, c_row_idx, counts_c = _union_with_birth_explicit(
            cpacked, jnp.repeat(birth_f, dp1), cap_c, t_frames)

        corner_idx = c_row_idx.reshape(cap_f, dp1)
        corner_bary = jnp.where(valid_f[:, None] & (corner_idx > 0), cbary, 0.0)
        # dst-sorted splat view: built once per sequence, reused by every
        # frame's coarsen (lattice_ops.splat_to_coarse fast path)
        links.append(lo_augment_link_sorted(
            LevelLink(corner_idx=corner_idx, corner_bary=corner_bary),
            cap_c))

        lvl, _ = _build_level(packed_c, birth_c, counts_c, t_frames,
                              None if nbr_caps is None else nbr_caps[l + 1])
        levels.append(lvl)
        packed_f, birth_f = packed_c, birth_c

    return SeqLattice(
        levels=tuple(levels), links=tuple(links),
        row_vertex=row_vertex, row_bary=row_bary, row_valid=row_valid,
        row_rel_pos=rel,
        point_vertex=row_vertex.reshape(t_frames, p, dp1),
        point_bary=row_bary.reshape(t_frames, p, dp1),
        nr_points=nr_points,
        sorted_pn=sorted_pn,
    )


def trim_sequence_lattice(lat: SeqLattice, trim_caps) -> SeqLattice:
    """Truncate a finalised SeqLattice to smaller static capacities for the
    TRIMMED (non-final) frames of the sequence forward.

    Stable indices are sorted by (birth, key), so every vertex alive during
    frames 0..T-2 has index < counts[T-2]: provided
    ``trim_caps[l] >= counts[T-2]`` per level, the [0, trim_caps[l]) row
    prefix contains the complete per-frame vertex sets of all trimmed
    frames, and rows outside it can only hold vertices born at the FINAL
    frame.  Neighbor/corner indices pointing past a trim cap are therefore
    unborn throughout the trimmed frames; remapping them to the reserved
    zero row (whose values are exactly zero -- the mask_rows invariant)
    reproduces the full-capacity gather semantics, and their ``found``
    masks are already False at trimmed frames via ``nbr_birth``.

    Results equal the full-capacity path up to f32 reduction order (the
    GN statistics and splat sums reduce over differently-shaped -- but
    identically-valued -- operands).  Undersized trim caps are the same
    failure class as a saturated table; the engine surfaces them as
    ``aux["trim_overflow"]`` (never silent).

    The per-frame ``counts``/``row_*`` arrays are shared with the full
    lattice; ``sorted_pn`` is dropped (the batched pointnet runs once at
    full capacity before the frame scan).
    """
    levels = []
    for l, lvl in enumerate(lat.levels):
        c = trim_caps[l]
        idx = lvl.nbr_idx[:c]
        levels.append(SeqLevel(
            keys=lvl.keys[:c], birth=lvl.birth[:c], counts=lvl.counts,
            nbr_idx=jnp.where(idx < c, idx, 0),
            nbr_found=lvl.nbr_found[:c], nbr_birth=lvl.nbr_birth[:c]))
    links = []
    for l, link in enumerate(lat.links):
        cf, cc = trim_caps[l], trim_caps[l + 1]
        ci = link.corner_idx[:cf]
        ok = ci < cc
        links.append(lo_augment_link_sorted(
            LevelLink(corner_idx=jnp.where(ok, ci, 0),
                      corner_bary=jnp.where(ok, link.corner_bary[:cf], 0.0)),
            cc))
    return SeqLattice(
        levels=tuple(levels), links=tuple(links),
        row_vertex=lat.row_vertex, row_bary=lat.row_bary,
        row_valid=lat.row_valid, row_rel_pos=lat.row_rel_pos,
        point_vertex=lat.point_vertex, point_bary=lat.point_bary,
        nr_points=(None if lat.nr_points is None
                   else lat.nr_points[:, :trim_caps[0]]),
        sorted_pn=None)


def _union_with_birth_explicit(cand_packed, cand_birth, capacity, n_frames):
    """Like _union_with_birth but with an explicit per-candidate birth frame
    (used for coarse levels, where birth is inherited from fine vertices;
    ``cand_birth`` is monotone in row order because fine stable indices are
    already birth-sorted, so the stable key-sort's run head carries the
    run-minimum birth)."""
    q = cand_packed.shape[0]
    rows = jnp.arange(q, dtype=jnp.int32)
    sp, sb, so = jax.lax.sort((cand_packed, cand_birth, rows), dimension=0,
                              num_keys=1)
    return _finish_union(sp, so, sb, capacity, n_frames)
