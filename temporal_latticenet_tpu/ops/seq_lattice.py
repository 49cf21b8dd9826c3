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
from .mxu_lookup import mxu_lookup_positions
from .lattice_ops import LevelLink, NeighborTable


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

    def frame_nbr(self, level: int, t) -> NeighborTable:
        """Neighbor table as visible at frame t (unborn neighbors absent)."""
        lv = self.levels[level]
        found = lv.nbr_found & (lv.nbr_birth <= t)
        return NeighborTable(idx=lv.nbr_idx, found=found)


def _union_with_birth(cand_packed: jax.Array, cand_order: jax.Array,
                      capacity: int, n_frames: int):
    """Assign birth-ordered stable indices to unique candidate keys.

    Args:
      cand_packed: (Q,) uint32 (PACKED_SENTINEL for invalid rows).
      cand_order:  (Q,) int32 monotone-in-frame priority (row order within a
        key run determines which frame counts as its birth: the minimum
        ``cand_order // per_frame`` of the run head).
      capacity: target table size (slot 0 reserved).

    Returns (packed_final (C,), birth (C,), row_idx (Q,), counts (T,)).
    """
    q = cand_packed.shape[0]
    per_frame = q // n_frames

    sp, so = jax.lax.sort((cand_packed, cand_order), dimension=0, num_keys=2)
    valid = sp != PACKED_SENTINEL
    head = valid & jnp.concatenate([jnp.ones((1,), bool), sp[1:] != sp[:-1]])
    birth_row = (so // per_frame).astype(jnp.int32)

    # Compact unique keys (in packed order) into a 2x-capacity buffer so the
    # subsequent birth-sort decides overflow drops by AGE (youngest first,
    # matching the streaming path's behaviour when the table fills).
    urank = jnp.cumsum(head.astype(jnp.int32)) - 1          # unique id per run
    buf = min(2 * capacity, q)
    dst = jnp.where(head & (urank < buf - 1), urank, buf)
    keys_u = jnp.full((buf,), PACKED_SENTINEL, jnp.uint32).at[
        dst].set(sp, mode="drop")
    birth_u = jnp.full((buf,), n_frames, jnp.int32).at[
        dst].set(birth_row, mode="drop")

    # Final order: (birth, packed); sentinels (birth=T, packed=max) sort last.
    uid = jnp.arange(buf, dtype=jnp.int32)
    b_s, p_s, u_s = jax.lax.sort((birth_u, keys_u, uid), dimension=0,
                                 num_keys=2)
    # final index of unique id u (slot 0 reserved => +1); beyond capacity -> 0
    final_of_uid = jnp.zeros((buf,), jnp.int32).at[u_s].set(
        jnp.arange(buf, dtype=jnp.int32) + 1)
    final_of_uid = jnp.where(final_of_uid < capacity, final_of_uid, 0)

    # Per-row resolution: propagate the run's unique id, then map to final.
    row_uid = jnp.where(valid, jnp.minimum(urank, buf - 1), 0)
    row_final = jnp.where(valid, final_of_uid[row_uid], 0)
    # rows whose unique key was dropped by compaction overflow go to 0
    row_final = jnp.where(valid & (urank < buf - 1), row_final, 0)
    row_idx = jnp.zeros((q,), jnp.int32).at[so].set(row_final)

    packed_final = jnp.full((capacity,), PACKED_SENTINEL, jnp.uint32)
    birth_final = jnp.full((capacity,), n_frames, jnp.int32)
    keep = p_s != PACKED_SENTINEL
    dst2 = jnp.where(keep, jnp.arange(buf, dtype=jnp.int32) + 1, capacity)
    packed_final = packed_final.at[dst2].set(p_s, mode="drop")
    birth_final = birth_final.at[dst2].set(b_s, mode="drop")

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


def _build_level(packed_final, birth_final, counts, n_frames):
    """Neighbor structure for a finalised level.

    NOTE: indices are in birth-then-packed order, so the table is NOT
    globally packed-sorted; lookups sort internally (merge lookup)."""
    cap = packed_final.shape[0]
    keys = unpack_keys(packed_final)

    offs = jnp.asarray(pm.neighbor_offsets(3))
    n_off = offs.shape[0]
    queries = (keys[:, None, :] + offs[None, :, :]).reshape(cap * n_off, 3)
    qpacked = pack_keys(queries)
    # sort the table once, then batched MXU lookups (no random gathers)
    stable = jnp.arange(cap, dtype=jnp.int32)
    s_packed, s_stable = jax.lax.sort((packed_final, stable), dimension=0,
                                      num_keys=1)
    pos = mxu_lookup_positions(s_packed, qpacked).reshape(cap, n_off)
    nbr = jnp.where(pos >= 0, s_stable[jnp.maximum(pos, 0)], -1)

    valid_self = packed_final != PACKED_SENTINEL
    self_idx = jnp.arange(cap, dtype=jnp.int32)
    idx = jnp.concatenate([jnp.maximum(nbr, 0), self_idx[:, None]], axis=1)
    found = jnp.concatenate([nbr >= 0, valid_self[:, None]], axis=1)
    found &= valid_self[:, None]
    nbr_birth = jnp.where(found, birth_final[idx], n_frames)

    return SeqLevel(keys=keys, birth=birth_final, counts=counts,
                    nbr_idx=idx, nbr_found=found, nbr_birth=nbr_birth), \
        (s_packed, s_stable)


def build_sequence_lattice(positions: jax.Array, mask: jax.Array, sigma,
                           capacities, nr_downsamples: int,
                           subtract_local_mean: bool = True) -> SeqLattice:
    """Args:
      positions: (T, P, 3) f32 padded frames.
      mask: (T, P) bool.
      capacities: per-level static table sizes.

    Returns a SeqLattice with all levels finalised and per-frame distribute
    outputs (matching ``lattice_ops.distribute``'s row semantics per frame).
    """
    t_frames, p, _ = positions.shape
    dp1 = 4
    cap0 = capacities[0]

    elevated = pm.elevate(positions.reshape(t_frames * p, 3), sigma)
    keys, bary = pm.find_enclosing_simplex(elevated)       # (T*P, 4, 3)
    keys = keys.reshape(t_frames, p * dp1, 3)
    bary = bary.reshape(t_frames, p * dp1)
    rvalid = jnp.repeat(mask, dp1, axis=1)                 # (T, P*4)

    flat_keys = jnp.where(rvalid.reshape(-1)[:, None],
                          keys.reshape(-1, 3), SENTINEL)
    cand_packed = pack_keys(flat_keys)
    cand_order = jnp.arange(t_frames * p * dp1, dtype=jnp.int32)
    packed0, birth0, row_idx, counts0 = _union_with_birth(
        cand_packed, cand_order, cap0, t_frames)

    row_vertex = row_idx.reshape(t_frames, p * dp1)
    row_valid = rvalid & (row_vertex > 0)
    row_bary = jnp.where(row_valid, bary, 0.0)

    # per-frame local mean of contributing point positions
    pos_rows = jnp.repeat(positions, dp1, axis=1)          # (T, P*4, 3)
    w = row_valid.astype(jnp.float32)
    if subtract_local_mean:
        def mean_one(pr, rv, wi):
            sums = jax.ops.segment_sum(pr * wi[:, None], rv, num_segments=cap0)
            cnts = jax.ops.segment_sum(wi, rv, num_segments=cap0)
            return pr - (sums / jnp.maximum(cnts, 1.0)[:, None])[rv]
        rel = jax.vmap(mean_one)(pos_rows, row_vertex, w)
    else:
        rel = pos_rows
    rel = rel * w[..., None]

    levels = []
    links = []
    lvl0, _ = _build_level(packed0, birth0, counts0, t_frames)
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
        links.append(LevelLink(corner_idx=corner_idx, corner_bary=corner_bary))

        lvl, _ = _build_level(packed_c, birth_c, counts_c, t_frames)
        levels.append(lvl)
        packed_f, birth_f = packed_c, birth_c

    return SeqLattice(
        levels=tuple(levels), links=tuple(links),
        row_vertex=row_vertex, row_bary=row_bary, row_valid=row_valid,
        row_rel_pos=rel,
        point_vertex=row_vertex.reshape(t_frames, p, dp1),
        point_bary=row_bary.reshape(t_frames, p, dp1),
    )


def _union_with_birth_explicit(cand_packed, cand_birth, capacity, n_frames):
    """Like _union_with_birth but with an explicit per-candidate birth frame
    (used for coarse levels, where birth is inherited from fine vertices)."""
    q = cand_packed.shape[0]
    rows = jnp.arange(q, dtype=jnp.int32)
    # sort by (key, birth) so the run head carries the MIN birth
    sp, sb, so = jax.lax.sort((cand_packed, cand_birth, rows), dimension=0,
                              num_keys=2)
    valid = sp != PACKED_SENTINEL
    head = valid & jnp.concatenate([jnp.ones((1,), bool), sp[1:] != sp[:-1]])

    urank = jnp.cumsum(head.astype(jnp.int32)) - 1
    buf = min(2 * capacity, q)
    dst = jnp.where(head & (urank < buf - 1), urank, buf)
    keys_u = jnp.full((buf,), PACKED_SENTINEL, jnp.uint32).at[dst].set(
        sp, mode="drop")
    birth_u = jnp.full((buf,), n_frames, jnp.int32).at[dst].set(
        sb, mode="drop")

    uid = jnp.arange(buf, dtype=jnp.int32)
    b_s, p_s, u_s = jax.lax.sort((birth_u, keys_u, uid), dimension=0,
                                 num_keys=2)
    final_of_uid = jnp.zeros((buf,), jnp.int32).at[u_s].set(
        jnp.arange(buf, dtype=jnp.int32) + 1)
    final_of_uid = jnp.where(final_of_uid < capacity, final_of_uid, 0)

    row_uid = jnp.where(valid, jnp.minimum(urank, buf - 1), 0)
    row_final = jnp.where(valid & (urank < buf - 1),
                          final_of_uid[row_uid], 0)
    row_idx = jnp.zeros((q,), jnp.int32).at[so].set(row_final)

    packed_final = jnp.full((capacity,), PACKED_SENTINEL, jnp.uint32)
    birth_final = jnp.full((capacity,), n_frames, jnp.int32)
    keep = p_s != PACKED_SENTINEL
    dst2 = jnp.where(keep, jnp.arange(buf, dtype=jnp.int32) + 1, capacity)
    packed_final = packed_final.at[dst2].set(p_s, mode="drop")
    birth_final = birth_final.at[dst2].set(b_s, mode="drop")

    counts = 1 + jnp.sum(
        (birth_final[None, :] <= jnp.arange(n_frames)[:, None])
        & (packed_final != PACKED_SENTINEL)[None, :], axis=1).astype(jnp.int32)
    return packed_final, birth_final, row_idx, counts
