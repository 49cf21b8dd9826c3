"""MXU-based table lookup: binary search without random gathers.

Random gathers are the slowest access pattern on TPU (~7 ns per element;
a 2M-element gather costs ~15 ms), and sort-merge lookups pay a full (C+Q)
bitonic sort.  This formulation searches a sorted table using only dense,
MXU/VPU-friendly primitives:

1. reshape the sorted table to (R, 128) rows; row heads are its column 0;
2. two levels of "count of heads <= q" broadcast comparisons find each
   query's row (the outer level keeps the comparison matrix small);
3. the query's candidate row is selected by a one-hot matmul
   (one_hot(row) @ table) -- an MXU contraction instead of a gather;
4. the in-row position is another <=-count, and the hit test reads the
   found entry with a lane-wise take_along_axis.

v2 (profile-driven): the v1 kernel multiplied the (chunk, R) one-hot with
four separate 8-bit byte-plane tables, paying the one-hot HBM traffic four
times (~17 ms at Q=885k, C=98304).  v2 stacks every byte plane -- the key's
four planes plus any caller-requested payload columns (e.g. the
sorted->stable map and per-vertex births for neighbor tables) -- into ONE
(R, 128*n_planes) table so the one-hot is read once, and emits bf16
(byte values 0..255 are exact in bf16, and a one-hot contraction does no
summation, so the result is exact).  Payload selection through the same
matmul removes the follow-up random gathers entirely.

Everything is standard XLA (no Pallas needed); chunked over queries to
bound the materialised one-hot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .vertex_table import PACKED_SENTINEL

LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _reassemble(sel: jax.Array, plane0: int, shifts) -> jax.Array:
    """Recombine byte planes ``plane0..`` of a selected-row matrix into u32."""
    out = None
    for i, s in enumerate(shifts):
        part = sel[:, (plane0 + i) * LANE:(plane0 + i + 1) * LANE]
        part = part.astype(jnp.uint32) << s
        out = part if out is None else (out | part)
    return out


def mxu_lookup_select(sorted_packed: jax.Array, q: jax.Array,
                      payloads=(), payload_bits=(),
                      chunk: int = 32768):
    """(Q,) packed queries -> (pos, selected payloads).

    Args:
      sorted_packed: (C,) uint32 ascending with PACKED_SENTINEL padding.
      q: (Q,) uint32 queries.
      payloads: tuple of (C,) int32 arrays aligned with ``sorted_packed``
        (values in [0, 2^bits)); each is selected at the hit position via
        the same one-hot contraction.
      payload_bits: value range of each payload (chooses the byte-plane
        count); same length as ``payloads``.

    Returns:
      pos: (Q,) int32 position in ``sorted_packed`` or -1 when absent.
      vals: tuple of (Q,) int32 payload values at the hit (0 where missed).
    """
    assert len(payloads) == len(payload_bits)
    c_orig = sorted_packed.shape[0]
    c = _ceil_to(c_orig, LANE)
    if c != c_orig:
        sorted_packed = jnp.full((c,), PACKED_SENTINEL, jnp.uint32
                                 ).at[:c_orig].set(sorted_packed)
        payloads = tuple(jnp.zeros((c,), jnp.int32).at[:c_orig].set(p)
                         for p in payloads)
    r = c // LANE
    tbl = sorted_packed.reshape(r, LANE)
    heads = tbl[:, 0]                                   # (R,)

    r_outer = _ceil_to(r, LANE) // LANE
    heads_pad = jnp.full((r_outer * LANE,), PACKED_SENTINEL, jnp.uint32
                         ).at[:r].set(heads)
    outer_heads = heads_pad.reshape(r_outer, LANE)[:, 0]  # (R_outer,)
    # byte planes of the head table (u32 values are NOT exact in f32/bf16
    # above 2^24, so head selection must also go through exact byte planes)
    head_planes = jnp.concatenate(
        [((heads_pad >> s) & jnp.uint32(0xFF)).astype(jnp.bfloat16)
         .reshape(r_outer, LANE) for s in (24, 16, 8, 0)], axis=1)

    # byte-plane stack: key planes first (high to low), then payload planes
    planes = [((sorted_packed >> s) & jnp.uint32(0xFF)).astype(jnp.bfloat16)
              .reshape(r, LANE) for s in (24, 16, 8, 0)]
    p_shifts = []
    for p, bits in zip(payloads, payload_bits):
        shifts = tuple(range(((int(bits) + 7) // 8 - 1) * 8, -8, -8))
        p_shifts.append(shifts)
        pu = p.astype(jnp.uint32)
        planes.extend(((pu >> s) & jnp.uint32(0xFF)).astype(jnp.bfloat16)
                      .reshape(r, LANE) for s in shifts)
    stacked = jnp.concatenate(planes, axis=1)          # (R, LANE*n_planes)

    qn = q.shape[0]
    q_pad = _ceil_to(qn, chunk)
    qq = jnp.full((q_pad,), PACKED_SENTINEL, jnp.uint32).at[:qn].set(q)

    def lookup_chunk(qc):
        # level A: which 128-row superblock (R_outer is tiny)
        sup = jnp.sum(qc[:, None] >= outer_heads[None, :], axis=1) - 1
        sup = jnp.clip(sup, 0, r_outer - 1)
        oh_sup = jax.nn.one_hot(sup, r_outer, dtype=jnp.bfloat16)
        sel_h = jnp.dot(oh_sup, head_planes,
                        preferred_element_type=jnp.bfloat16)
        sup_heads = _reassemble(sel_h, 0, (24, 16, 8, 0))
        row_in_sup = jnp.sum(qc[:, None] >= sup_heads, axis=1) - 1
        row = jnp.clip(sup * LANE + row_in_sup, 0, r - 1)

        # level B: ONE one-hot contraction selects the candidate row of
        # every plane (exact: single 1 per row, byte values exact in bf16)
        oh_row = jax.nn.one_hot(row, r, dtype=jnp.bfloat16)
        sel = jnp.dot(oh_row, stacked, preferred_element_type=jnp.bfloat16)

        rows = _reassemble(sel, 0, (24, 16, 8, 0))
        col = jnp.sum(qc[:, None] >= rows, axis=1) - 1
        col = jnp.clip(col, 0, LANE - 1)
        hit_val = jnp.take_along_axis(rows, col[:, None], axis=1)[:, 0]
        pos = row * LANE + col
        hit = (hit_val == qc) & (qc != PACKED_SENTINEL)

        vals = []
        plane0 = 4
        for shifts in p_shifts:
            pv = _reassemble(sel, plane0, shifts)
            plane0 += len(shifts)
            v = jnp.take_along_axis(pv, col[:, None], axis=1)[:, 0]
            vals.append(jnp.where(hit, v.astype(jnp.int32), 0))
        return (jnp.where(hit, pos.astype(jnp.int32), -1), tuple(vals))

    chunks = qq.reshape(q_pad // chunk, chunk)
    pos, vals = jax.lax.map(lookup_chunk, chunks)
    pos = pos.reshape(q_pad)[:qn]
    vals = tuple(v.reshape(q_pad)[:qn] for v in vals)
    return pos, vals


def mxu_lookup_positions(sorted_packed: jax.Array, q: jax.Array,
                         chunk: int = 32768) -> jax.Array:
    """(Q,) packed queries -> (Q,) positions into ``sorted_packed`` where
    the entry equals the query, or -1."""
    pos, _ = mxu_lookup_select(sorted_packed, q, chunk=chunk)
    return pos
