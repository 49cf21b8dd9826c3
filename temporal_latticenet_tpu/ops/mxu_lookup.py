"""MXU-based table lookup: binary search without random gathers.

Random gathers are the slowest access pattern on TPU (dependent (Q,)
gathers cost ~5 ms per pass at Q=5e5), and sort-merge lookups pay a full
(C+Q) bitonic sort.  This formulation searches a sorted table using only
dense, MXU/VPU-friendly primitives:

1. reshape the sorted table to (R, 128) rows; row heads are its column 0;
2. two levels of "count of heads <= q" broadcast comparisons find each
   query's row (the outer level keeps the comparison matrix small);
3. the query's candidate row is selected by a one-hot matmul
   (one_hot(row) @ table) -- an MXU contraction instead of a gather;
4. the in-row position is another <=-count, and the hit test reads the
   found entry with a lane-wise take_along_axis.

Everything is standard XLA (no Pallas needed); the one-hot contraction is
chunked over queries to bound the materialised one-hot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .vertex_table import PACKED_SENTINEL

LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def mxu_lookup_positions(sorted_packed: jax.Array, q: jax.Array,
                         chunk: int = 32768) -> jax.Array:
    """(Q,) packed queries -> (Q,) positions into ``sorted_packed`` where
    the entry equals the query, or -1.

    ``sorted_packed``: (C,) uint32 ascending with PACKED_SENTINEL padding;
    C must be a multiple of 128 (vertex capacities are powers of two).
    """
    c_orig = sorted_packed.shape[0]
    c = _ceil_to(c_orig, LANE)
    if c != c_orig:
        sorted_packed = jnp.full((c,), PACKED_SENTINEL, jnp.uint32
                                 ).at[:c_orig].set(sorted_packed)
    r = c // LANE
    tbl = sorted_packed.reshape(r, LANE)
    heads = tbl[:, 0]                                   # (R,)

    r_outer = _ceil_to(r, LANE) // LANE
    heads_pad = jnp.full((r_outer * LANE,), PACKED_SENTINEL, jnp.uint32
                         ).at[:r].set(heads)
    outer_heads = heads_pad.reshape(r_outer, LANE)[:, 0]  # (R_outer,)

    qn = q.shape[0]
    q_pad = _ceil_to(qn, chunk)
    qq = jnp.full((q_pad,), PACKED_SENTINEL, jnp.uint32).at[:qn].set(q)

    def lookup_chunk(qc):
        # level A: which 128-row superblock (R_outer is tiny)
        sup = jnp.sum(qc[:, None] >= outer_heads[None, :], axis=1) - 1
        sup = jnp.clip(sup, 0, r_outer - 1)
        # heads of the superblock, one per query: (chunk, 128) via one-hot MXU
        oh_sup = jax.nn.one_hot(sup, r_outer, dtype=jnp.bfloat16)
        sup_heads = _u32_matmul(oh_sup, heads_pad.reshape(r_outer, LANE))
        row_in_sup = jnp.sum(qc[:, None] >= sup_heads, axis=1) - 1
        row = jnp.clip(sup * LANE + row_in_sup, 0, r - 1)
        # level B: the candidate row's 128 entries via one-hot MXU
        oh_row = jax.nn.one_hot(row, r, dtype=jnp.bfloat16)
        rows = _u32_matmul(oh_row, tbl)                  # (chunk, 128)
        col = jnp.sum(qc[:, None] >= rows, axis=1) - 1
        col = jnp.clip(col, 0, LANE - 1)
        hit_val = jnp.take_along_axis(rows, col[:, None], axis=1)[:, 0]
        pos = row * LANE + col
        hit = (hit_val == qc) & (qc != PACKED_SENTINEL)
        return jnp.where(hit, pos.astype(jnp.int32), -1)

    chunks = qq.reshape(q_pad // chunk, chunk)
    out = jax.lax.map(lookup_chunk, chunks)
    return out.reshape(q_pad)[:qn]


def _u32_matmul(onehot_bf16: jax.Array, table_u32: jax.Array) -> jax.Array:
    """Select uint32 rows with a one-hot matmul, exactly.

    bf16 mantissas hold 8 bits, so the table splits into four 8-bit chunks
    (each value 0..255 is exact in bf16); a one-hot row has a single 1, so
    every product and the f32 accumulation are exact, and the chunks
    recombine losslessly.
    """
    out = None
    for shift in (24, 16, 8, 0):
        chunk = ((table_u32 >> shift) & jnp.uint32(0xFF)).astype(jnp.bfloat16)
        sel = jnp.dot(onehot_bf16, chunk, preferred_element_type=jnp.float32)
        part = sel.astype(jnp.uint32) << shift
        out = part if out is None else (out | part)
    return out
