"""Static-capacity vertex tables: the TPU-native replacement for the CUDA
``latticenet.HashTable`` (imported at
``/root/reference/seq_lattice/lattice_modules.py:7``).

Design (see SURVEY.md section 7.1): instead of a GPU hashmap we keep a
fixed-capacity array of lattice keys in **stable (insertion) order** plus a
lexicographically **sorted view** used for O(log C) batched binary-search
lookups.  Insertion is append-only, which reproduces the reference's
temporal invariant -- the hashmap is *not* reset between frames of a
sequence, so existing vertex indices never move and the vertex set only
grows (`/root/reference/seq_lattice/models.py:286-289`).

Stable slot 0 is reserved as the "invalid" bucket: rows of the distribute
output whose insertion failed map to it and its features are forced to zero,
mirroring the reference's "index -1 -> row 0 -> zeroed" convention
(`/root/reference/seq_lattice/lattice_modules.py:479-480,569-570`).

All shapes are static; the vertex count is a traced scalar.  Everything here
runs under jit on TPU (and on the CPU backend for tests).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

# Plain numpy scalar on purpose: a jnp constant here would initialise the
# JAX backend at import time.
SENTINEL = np.int32(2**31 - 1)


@flax.struct.dataclass
class VertexTable:
    """Fixed-capacity set of integer lattice keys with stable indices.

    Attributes:
      keys:             (C, d) int32, indexed by stable index.  Unused slots
                        (and reserved slot 0) hold SENTINEL coordinates.
      sorted_keys:      (C, d) int32, the same keys in lexicographic order
                        (sentinel rows sort last).
      sorted_to_stable: (C,) int32 mapping sorted position -> stable index.
      count:            () int32, number of used stable slots *including*
                        the reserved slot 0.
    """

    keys: jax.Array
    sorted_keys: jax.Array
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
    keys = jnp.full((capacity, d), SENTINEL, dtype=jnp.int32)
    return VertexTable(
        keys=keys,
        sorted_keys=keys,
        sorted_to_stable=jnp.arange(capacity, dtype=jnp.int32),
        count=jnp.int32(1),
    )


def _lex_less(a: jax.Array, b: jax.Array) -> jax.Array:
    """Lexicographic a < b over the last axis (int32 keys)."""
    out = a[..., -1] < b[..., -1]
    for i in range(a.shape[-1] - 2, -1, -1):
        out = (a[..., i] < b[..., i]) | ((a[..., i] == b[..., i]) & out)
    return out


def _sort_with_payload(keys: jax.Array, payload: jax.Array):
    """Lexicographically sort (Q, d) keys carrying an int payload."""
    d = keys.shape[-1]
    operands = tuple(keys[:, i] for i in range(d)) + (payload,)
    out = jax.lax.sort(operands, dimension=0, num_keys=d)
    return jnp.stack(out[:d], axis=-1), out[d]


def lookup(table: VertexTable, queries: jax.Array) -> jax.Array:
    """Batched lower-bound binary search of (Q, d) query keys.

    Returns (Q,) int32 stable indices, or -1 where the key is absent.
    Sentinel queries (padding) always return -1.
    """
    cap = table.capacity
    q = queries.shape[0]
    n_iter = max(1, (cap).bit_length())
    lo = jnp.zeros((q,), jnp.int32)
    hi = jnp.full((q,), cap, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        mid_keys = table.sorted_keys[mid]
        less = _lex_less(mid_keys, queries)
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo, _ = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    pos = jnp.minimum(lo, cap - 1)
    hit = jnp.all(table.sorted_keys[pos] == queries, axis=-1)
    hit &= queries[:, 0] != SENTINEL
    return jnp.where(hit, table.sorted_to_stable[pos], -1)


def union_and_index(table: VertexTable, cand_keys: jax.Array,
                    cand_valid: jax.Array):
    """Insert candidate keys (append-only) and index every candidate row.

    This is the growth step of distribute/coarsen: the TPU analog of the
    CUDA hash insert performed per point-simplex pair
    (`/root/reference/seq_lattice/lattice_modules.py:479-480` observes its
    -1-on-failure contract).  Deterministic: new unique keys are appended in
    lexicographic order.

    Args:
      table:      current VertexTable.
      cand_keys:  (Q, d) int32 candidate keys.
      cand_valid: (Q,) bool; invalid rows are ignored and indexed 0.

    Returns:
      (new_table, row_idx) where row_idx is (Q,) int32 stable index per
      candidate row; 0 (the invalid bucket) for invalid rows and for rows
      dropped because the table overflowed.
    """
    qn, d = cand_keys.shape
    cap = table.capacity

    keys = jnp.where(cand_valid[:, None], cand_keys, SENTINEL)

    # Sort candidates so duplicates become adjacent runs.
    row_ids = jnp.arange(qn, dtype=jnp.int32)
    skeys, sorder = _sort_with_payload(keys, row_ids)

    is_valid = skeys[:, 0] != SENTINEL
    prev_same = jnp.concatenate(
        [jnp.zeros((1,), bool),
         jnp.all(skeys[1:] == skeys[:-1], axis=-1)])
    head = is_valid & ~prev_same  # first occurrence of each unique key

    # Which unique keys already exist?
    found = lookup(table, skeys)  # (-1 where new); only heads matter
    is_new = head & (found < 0)

    # Append new unique keys in sorted order.
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    new_stable = table.count + new_rank
    overflow = new_stable >= cap
    new_stable = jnp.where(is_new & ~overflow, new_stable, 0)

    head_stable = jnp.where(is_new, new_stable, jnp.maximum(found, 0))

    # Propagate each run head's stable index to the whole run.
    run_id = jnp.cumsum(head.astype(jnp.int32)) - 1
    runs = jnp.zeros((qn,), jnp.int32).at[jnp.where(head, run_id, qn)].set(
        head_stable, mode="drop")
    sorted_idx = jnp.where(is_valid, runs[jnp.maximum(run_id, 0)], 0)

    # Scatter back to the original candidate order.
    row_idx = jnp.zeros((qn,), jnp.int32).at[sorder].set(sorted_idx)

    # Update the stable key array (out-of-range scatter indices are dropped).
    scatter_at = jnp.where(is_new & ~overflow, new_stable, cap)
    new_keys = table.keys.at[scatter_at].set(skeys, mode="drop")
    n_added = jnp.sum((is_new & ~overflow).astype(jnp.int32))
    new_count = jnp.minimum(table.count + n_added, cap)

    # Refresh the sorted view (one C-sized sort; C is small, ~1e5).
    stable_ids = jnp.arange(cap, dtype=jnp.int32)
    sorted_keys, sorted_to_stable = _sort_with_payload(new_keys, stable_ids)

    new_table = VertexTable(
        keys=new_keys,
        sorted_keys=sorted_keys,
        sorted_to_stable=sorted_to_stable,
        count=new_count,
    )
    return new_table, row_idx
