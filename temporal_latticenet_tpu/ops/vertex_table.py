"""Static-capacity vertex tables: the TPU-native replacement for the CUDA
``latticenet.HashTable`` (imported at
``/root/reference/seq_lattice/lattice_modules.py:7``).

Design (third iteration, informed by on-TPU profiling):

* Every permutohedral vertex key has all full coordinates congruent to the
  same remainder r (mod d+1) -- so a 3-coordinate key packs losslessly into
  ONE uint32: 10 bits per (coord - r)/4 plus 2 bits of r.  Sorting and
  searching single uint32 arrays is ~4x cheaper than lexicographic
  multi-operand sorts on TPU (bitonic passes scale with operand count), and
  lookups become a plain vectorised binary search over one array.
* The table keeps the packed keys in **stable (insertion) order** plus a
  sorted view for O(log C) batched lookups, and the unpacked (C, 3) int32
  coordinates for geometry consumers (neighbor offsets, coarsening).
* Insertion is append-only, reproducing the reference's temporal invariant:
  the hashmap is *not* reset between frames, indices never move, the vertex
  set only grows (`/root/reference/seq_lattice/models.py:286-289`).
* Stable slot 0 is reserved as the "invalid" bucket: rows whose insertion
  failed (capacity overflow or out-of-range keys) map to it and its features
  are forced to zero, mirroring "index -1 -> row 0 -> zeroed"
  (`/root/reference/seq_lattice/lattice_modules.py:479-480,569-570`).

Earlier designs, kept in git history for the record: a lexicographic
multi-key sort table (correct but sort-bound: ~63% of sequence time) and an
XLA open-addressing hash with scatter-min claims (5x slower end-to-end;
scatters in a probe loop are poison on TPU).

Range limit: packed coordinates cover c in [-2044, 2043] per axis, i.e.
positions up to ~250 m from the origin at sigma 0.6 -- far beyond the
reference's 60 m cap (`lnn_train_semantic_kitti.cfg:98`).  Out-of-range
keys are treated as invalid (dropped to slot 0), same as a failed insert.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

# Plain numpy scalars on purpose: jnp constants here would initialise the
# JAX backend at import time.
SENTINEL = np.int32(2**31 - 1)       # unpacked padding coordinate
PACKED_SENTINEL = np.uint32(0xFFFFFFFF)

_D = 3
_DP1 = 4
_BIAS = 512
_MMAX = 1021  # (coord-r)/4 + _BIAS must stay in [0, _MMAX] < 1023


def pack_keys(keys: jax.Array) -> jax.Array:
    """(Q, 3) int32 lattice keys -> (Q,) uint32; PACKED_SENTINEL when any
    coordinate is out of the representable range (or is the SENTINEL pad).

    mod/div by d+1 = 4 are bitwise (& 3, >> 2): two's-complement arithmetic
    shift and AND implement floor semantics for negatives exactly, and the
    VPU has no integer divider (a real // 4 costs ~9 ms at 2M rows,
    scripts/profile_union.py r2 bisection)."""
    r = keys[:, 0] & 3                        # floor-mod 4, negatives incl.
    m = ((keys - r[:, None]) >> 2) + _BIAS    # exact multiples: >>2 == //4
    in_range = jnp.all((m >= 0) & (m <= _MMAX), axis=-1)
    in_range &= keys[:, 0] != SENTINEL
    mu = m.astype(jnp.uint32)
    packed = ((mu[:, 0] << 22) | (mu[:, 1] << 12) | (mu[:, 2] << 2)
              | r.astype(jnp.uint32))
    return jnp.where(in_range, packed, PACKED_SENTINEL)


def unpack_keys(packed: jax.Array) -> jax.Array:
    """(Q,) uint32 -> (Q, 3) int32 (SENTINEL rows for PACKED_SENTINEL)."""
    r = (packed & 0x3).astype(jnp.int32)
    m0 = ((packed >> 22) & 0x3FF).astype(jnp.int32) - _BIAS
    m1 = ((packed >> 12) & 0x3FF).astype(jnp.int32) - _BIAS
    m2 = ((packed >> 2) & 0x3FF).astype(jnp.int32) - _BIAS
    keys = jnp.stack([m0, m1, m2], axis=-1) * _DP1 + r[:, None]
    return jnp.where((packed == PACKED_SENTINEL)[:, None], SENTINEL, keys)


@flax.struct.dataclass
class VertexTable:
    """Fixed-capacity set of lattice keys with stable indices.

    Attributes:
      keys:             (C, 3) int32 unpacked coordinates by stable index
                        (SENTINEL rows for unused slots and reserved slot 0).
      packed:           (C,) uint32 packed keys by stable index.
      sorted_packed:    (C,) uint32, ascending (sentinels sort last).
      sorted_to_stable: (C,) int32 sorted position -> stable index.
      count:            () int32 used stable slots *including* slot 0.
    """

    keys: jax.Array
    packed: jax.Array
    sorted_packed: jax.Array
    sorted_to_stable: jax.Array
    count: jax.Array

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def dim(self) -> int:
        return self.keys.shape[1]


def make_table(capacity: int, d: int = 3) -> VertexTable:
    """Fresh empty table; slot 0 pre-reserved as the invalid bucket."""
    assert d == _D, "packed tables support d=3 point clouds"
    return VertexTable(
        keys=jnp.full((capacity, d), SENTINEL, dtype=jnp.int32),
        packed=jnp.full((capacity,), PACKED_SENTINEL, dtype=jnp.uint32),
        sorted_packed=jnp.full((capacity,), PACKED_SENTINEL, dtype=jnp.uint32),
        sorted_to_stable=jnp.arange(capacity, dtype=jnp.int32),
        count=jnp.int32(1),
    )


def lookup_packed(table: VertexTable, q: jax.Array) -> jax.Array:
    """(Q,) packed queries -> (Q,) stable indices or -1.

    MXU-based (ops/mxu_lookup.py): one-hot matmul row selection instead of
    random gathers or a (C+Q) merge sort -- measured ~3x faster in-graph at
    Q=9e5, C=1e5.
    """
    from .mxu_lookup import mxu_lookup_select
    bits = max(int(table.capacity - 1).bit_length(), 1)
    pos, (st,) = mxu_lookup_select(table.sorted_packed, q,
                                   payloads=(table.sorted_to_stable,),
                                   payload_bits=(bits,))
    return jnp.where(pos >= 0, st, -1)


def lookup(table: VertexTable, queries: jax.Array) -> jax.Array:
    """(Q, 3) int32 query keys -> (Q,) stable indices or -1.

    Sentinel / out-of-range queries always return -1."""
    return lookup_packed(table, pack_keys(queries))


def union_and_index(table: VertexTable, cand_keys: jax.Array,
                    cand_valid: jax.Array):
    """Insert candidate keys (append-only) and index every candidate row.

    The growth step of distribute/coarsen: the TPU analog of the CUDA hash
    insert performed per point-simplex pair
    (`/root/reference/seq_lattice/lattice_modules.py:479-480` observes its
    -1-on-failure contract).  Deterministic: new unique keys are appended
    in ascending packed order.

    Args:
      table:      current VertexTable.
      cand_keys:  (Q, 3) int32 candidate keys.
      cand_valid: (Q,) bool; invalid rows are ignored and indexed 0.

    Returns:
      (new_table, row_idx): (Q,) int32 stable index per candidate row; 0
      for invalid rows and rows dropped on overflow.
    """
    qn = cand_keys.shape[0]
    cap = table.capacity
    n = cap + qn

    packed = pack_keys(jnp.where(cand_valid[:, None], cand_keys, SENTINEL))

    # ONE combined (C+Q) sort does everything: duplicates become runs, and a
    # run that contains a table entry has it first (its payload, the stable
    # id < cap, sorts before candidate payloads >= cap).
    keys = jnp.concatenate([table.sorted_packed, packed])
    payload = jnp.concatenate([table.sorted_to_stable,
                               jnp.arange(qn, dtype=jnp.int32) + cap])
    sk, sp = jax.lax.sort((keys, payload), dimension=0, num_keys=2)

    is_table = sp < cap
    is_cand = ~is_table
    valid = sk != PACKED_SENTINEL
    head = valid & jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])

    # A candidate that heads its run has no equal table entry => new key.
    is_new = head & is_cand

    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    new_stable = table.count + new_rank
    ok = is_new & (new_stable < cap)
    new_stable = jnp.where(ok, new_stable, 0)

    # Each run head's stable index (table entry's id or the freshly
    # assigned one), propagated to the whole run.
    head_stable = jnp.where(is_table, sp, new_stable)
    run_id = jnp.cumsum(head.astype(jnp.int32)) - 1
    runs = jnp.zeros((n,), jnp.int32).at[jnp.where(head, run_id, n)].set(
        head_stable, mode="drop")
    resolved = jnp.where(valid, runs[jnp.maximum(run_id, 0)], 0)

    # Scatter candidate resolutions back to original row order.
    row_idx = jnp.zeros((qn,), jnp.int32).at[
        jnp.where(is_cand, sp - cap, qn)].set(resolved, mode="drop")

    # Stable-order arrays: append the new unique keys.
    scatter_at = jnp.where(ok, new_stable, cap)
    new_keys = table.keys.at[scatter_at].set(unpack_keys(sk), mode="drop")
    new_packed = table.packed.at[scatter_at].set(sk, mode="drop")
    n_added = jnp.sum(ok.astype(jnp.int32))
    new_count = jnp.minimum(table.count + n_added, cap)

    # Sorted view rebuilt by compaction from the already-sorted combined
    # array -- no extra sort.  Kept rows: existing table entries + new keys.
    keep = (is_table & valid) | ok
    kpos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dst = jnp.where(keep & (kpos < cap), kpos, cap)
    sorted_packed = jnp.full((cap,), PACKED_SENTINEL, jnp.uint32).at[
        dst].set(sk, mode="drop")
    sorted_to_stable = jnp.zeros((cap,), jnp.int32).at[dst].set(
        jnp.where(is_table, sp, new_stable), mode="drop")

    new_table = VertexTable(
        keys=new_keys,
        packed=new_packed,
        sorted_packed=sorted_packed,
        sorted_to_stable=sorted_to_stable,
        count=new_count,
    )
    return new_table, row_idx
