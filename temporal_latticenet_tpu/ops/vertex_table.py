"""Static-capacity vertex tables: the TPU-native replacement for the CUDA
``latticenet.HashTable`` (imported at
``/root/reference/seq_lattice/lattice_modules.py:7``).

Design: an open-addressing hash table expressed entirely in XLA ops -- a
(H,) slot->stable-index array with linear probing, where each probe step is
a batched gather + compare and inserts are race-free via a scatter-min
"claim" pass (deterministic winner = lowest candidate row id).  This keeps
the reference's data structure *shape* (hash + probe, insert-on-miss) while
replacing CUDA atomics with XLA's deterministic scatter combinators, and it
avoids TPU ``sort`` entirely (bitonic sorts of ~5e5-row key sets dominated
the first, sort-based implementation of this module).

Semantics preserved from the reference:
* insertion is append-only -- the hashmap is *not* reset between frames of
  a sequence, so existing vertex indices never move and the vertex set only
  grows (`/root/reference/seq_lattice/models.py:286-289`);
* stable slot 0 is reserved as the "invalid" bucket: rows whose insertion
  failed (overflow / probe exhaustion) map to it and its features are
  forced to zero, mirroring "index -1 -> row 0 -> zeroed"
  (`/root/reference/seq_lattice/lattice_modules.py:479-480,569-570`).

All shapes are static; the vertex count is a traced scalar.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

# Padding key coordinate; never a real key.  A plain numpy scalar on purpose:
# a jnp constant here would initialise the JAX backend at import time.
SENTINEL = np.int32(2**31 - 1)

MAX_PROBES = 16
_SLOTS_PER_CAPACITY = 4  # load factor <= 0.25 keeps probe chains ~1


def _hash_capacity(capacity: int) -> int:
    return 1 << int(np.ceil(np.log2(max(_SLOTS_PER_CAPACITY * capacity, 64))))


@flax.struct.dataclass
class VertexTable:
    """Fixed-capacity set of integer lattice keys with stable indices.

    Attributes:
      keys:           (C, d) int32, indexed by stable index.  Unused slots
                      (and reserved slot 0) hold SENTINEL coordinates.
      slot_to_stable: (H,) int32 hash slot -> stable index, -1 when empty.
      count:          () int32, used stable slots *including* reserved 0.
    """

    keys: jax.Array
    slot_to_stable: jax.Array
    count: jax.Array

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def dim(self) -> int:
        return self.keys.shape[1]

    @property
    def hash_capacity(self) -> int:
        return self.slot_to_stable.shape[0]


def make_table(capacity: int, d: int = 3) -> VertexTable:
    """Fresh empty table; slot 0 pre-reserved as the invalid bucket."""
    return VertexTable(
        keys=jnp.full((capacity, d), SENTINEL, dtype=jnp.int32),
        slot_to_stable=jnp.full((_hash_capacity(capacity),), -1, jnp.int32),
        count=jnp.int32(1),
    )


def _hash_keys(keys: jax.Array, h_cap: int) -> jax.Array:
    """Multiplicative mixing hash of (Q, d) int32 keys -> (Q,) slot ids."""
    u = keys.astype(jnp.uint32)
    h = u[:, 0] * jnp.uint32(0x9E3779B1)
    h ^= u[:, 1] * jnp.uint32(0x85EBCA77)
    h ^= u[:, 2] * jnp.uint32(0xC2B2AE3D)
    h ^= h >> 15
    h *= jnp.uint32(0x27D4EB2F)
    h ^= h >> 13
    return (h & jnp.uint32(h_cap - 1)).astype(jnp.int32)


def lookup(table: VertexTable, queries: jax.Array) -> jax.Array:
    """Batched probe of (Q, d) query keys.

    Returns (Q,) int32 stable indices, or -1 where absent.  Sentinel
    (padding) queries always return -1.
    """
    h_cap = table.hash_capacity
    base = _hash_keys(queries, h_cap)
    valid = queries[:, 0] != SENTINEL

    def body(k, state):
        idx, open_ = state
        slot = (base + k) & (h_cap - 1)
        s = table.slot_to_stable[slot]
        key_s = table.keys[jnp.maximum(s, 0)]
        match = (s >= 0) & jnp.all(key_s == queries, axis=-1)
        idx = jnp.where(open_ & match, s, idx)
        open_ &= ~match & (s >= 0)  # empty slot => key absent, stop
        return idx, open_

    idx0 = jnp.full(queries.shape[0], -1, jnp.int32)
    idx, _ = jax.lax.fori_loop(0, MAX_PROBES, body, (idx0, valid))
    return jnp.where(valid, idx, -1)


def union_and_index(table: VertexTable, cand_keys: jax.Array,
                    cand_valid: jax.Array):
    """Insert candidate keys (append-only) and index every candidate row.

    The growth step of distribute/coarsen.  Race-free parallel insertion:
    at each probe step, unresolved candidates targeting an empty slot
    "claim" it via a scatter-min of their row id; the winning row appends
    its key (index = running count + rank-among-winners) and equal-key
    losers adopt the winner's index in the same step.

    Args:
      table:      current VertexTable.
      cand_keys:  (Q, d) int32 candidate keys.
      cand_valid: (Q,) bool; invalid rows are ignored and indexed 0.

    Returns:
      (new_table, row_idx): row_idx (Q,) int32 stable index per candidate,
      0 for invalid rows and rows dropped on overflow/probe exhaustion.
    """
    qn, d = cand_keys.shape
    cap = table.capacity
    h_cap = table.hash_capacity
    int_max = jnp.int32(2**31 - 1)

    keys = jnp.where(cand_valid[:, None], cand_keys, SENTINEL)
    base = _hash_keys(keys, h_cap)
    row_ids = jnp.arange(qn, dtype=jnp.int32)

    def body(k, state):
        tbl_keys, slots, count, idx, open_ = state
        slot = (base + k) & (h_cap - 1)
        s = slots[slot]
        key_s = tbl_keys[jnp.maximum(s, 0)]
        match = (s >= 0) & jnp.all(key_s == keys, axis=-1)
        idx = jnp.where(open_ & match, s, idx)
        open_ = open_ & ~match

        # claim empty slots: lowest row id wins
        want = open_ & (s < 0)
        claim = jnp.full((h_cap,), int_max, jnp.int32).at[
            jnp.where(want, slot, h_cap)].min(row_ids, mode="drop")
        winner = want & (claim[slot] == row_ids)

        rank = jnp.cumsum(winner.astype(jnp.int32)) - 1
        stable = count + rank
        ok = winner & (stable < cap)
        stable = jnp.where(ok, stable, 0)

        # append winners
        tbl_keys = tbl_keys.at[jnp.where(ok, stable, cap)].set(keys, mode="drop")
        slots = slots.at[jnp.where(ok, slot, h_cap)].set(stable, mode="drop")
        count = jnp.minimum(count + jnp.sum(winner.astype(jnp.int32)), cap)

        idx = jnp.where(ok, stable, idx)
        open_ = open_ & ~winner  # winners (incl. dropped) are done

        # equal-key losers resolve against the freshly written slot
        s2 = slots[slot]
        key_s2 = tbl_keys[jnp.maximum(s2, 0)]
        match2 = (s2 >= 0) & jnp.all(key_s2 == keys, axis=-1)
        idx = jnp.where(open_ & match2, s2, idx)
        open_ = open_ & ~match2
        return tbl_keys, slots, count, idx, open_

    idx0 = jnp.zeros(qn, jnp.int32)
    state = (table.keys, table.slot_to_stable, table.count, idx0, cand_valid)
    tbl_keys, slots, count, idx, open_ = jax.lax.fori_loop(
        0, MAX_PROBES, body, state)

    row_idx = jnp.where(cand_valid & ~open_, jnp.maximum(idx, 0), 0)
    new_table = VertexTable(keys=tbl_keys, slot_to_stable=slots, count=count)
    return new_table, row_idx
