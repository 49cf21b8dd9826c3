"""Lattice compute ops: distribute (splat front-end), neighbor tables,
lattice convolution, coarsen/finefy index maps and the deform-slice.

These are the TPU-native equivalents of the external CUDA kernels the
reference calls through ``latticenet_py`` wrappers:

* distribute      -> ``DistributeLatticeModule`` (/root/reference/seq_lattice/models.py:297-298)
* neighbor table + conv -> ``ConvLatticeModule`` / ``Im2RowLattice``
                    (/root/reference/seq_lattice/lattice_modules.py:299-304,573)
* coarsen/finefy  -> ``GnReluCoarsen`` / ``GnReluFinefy``
                    (/root/reference/seq_lattice/models.py:182,214,353,398)
* slice           -> ``SliceFastCUDALatticeModule`` (/root/reference/seq_lattice/models.py:465)

Everything operates on static-capacity arrays with a traced occupancy count;
compute maps onto gathers + MXU matmuls with no data-dependent shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.struct
import jax
import jax.numpy as jnp

from . import permutohedral as pm
from .vertex_table import VertexTable, lookup, union_and_index


@flax.struct.dataclass
class DistributeOut:
    """Result of splatting one frame's point cloud onto a vertex table.

    Mirrors the tuple returned by the reference's distribute call
    (``ls, distributed, indices, weights`` -- models.py:298) in masked,
    static-shape form.  Row r of the flattened (P*(d+1)) arrays corresponds
    to (point r // (d+1), simplex-vertex r % (d+1)).
    """

    row_vertex: jax.Array     # (P*(d+1),) int32 stable vertex index (0 = invalid)
    row_bary: jax.Array       # (P*(d+1),) f32 barycentric weight (0 for invalid rows)
    row_rel_pos: jax.Array    # (P*(d+1), d) f32 point xyz minus per-vertex mean xyz
    row_valid: jax.Array      # (P*(d+1),) bool
    point_vertex: jax.Array   # (P, d+1) int32 per-point simplex indices (for slice)
    point_bary: jax.Array     # (P, d+1) f32 per-point barycentric weights


def distribute(table: VertexTable, positions: jax.Array, point_mask: jax.Array,
               sigma, subtract_local_mean: bool = True):
    """Splat points onto the lattice, growing the vertex table append-only.

    Args:
      table: current-level VertexTable (carries across frames -- the
        ``reset_hashmap=False`` semantics of models.py:286-289 fall out of
        simply passing last frame's table back in).
      positions: (P, d) f32, zero-padded.
      point_mask: (P,) bool validity.
      sigma: lattice scale (scalar or (d,)).
      subtract_local_mean: the reference's default behaviour; disabled by the
        ``pointnet_no_local_mean`` experiments (models.py:39).

    Returns: (new_table, DistributeOut)
    """
    p, d = positions.shape
    dp1 = d + 1

    elevated = pm.elevate(positions, sigma)
    keys, bary = pm.find_enclosing_simplex(elevated)     # (P, d+1, d), (P, d+1)

    flat_keys = keys.reshape(p * dp1, d)
    flat_valid = jnp.repeat(point_mask, dp1)
    new_table, row_vertex = union_and_index(table, flat_keys, flat_valid)

    row_valid = flat_valid & (row_vertex > 0)
    row_bary = jnp.where(row_valid, bary.reshape(-1), 0.0)

    # Per-vertex mean of contributing point positions ("local mean",
    # cf. scatter_mean over indices in models.py:452-454).
    cap = table.capacity
    pos_rows = jnp.repeat(positions, dp1, axis=0)        # (P*(d+1), d)
    w = row_valid.astype(jnp.float32)
    if subtract_local_mean:
        # one fused 4-channel scatter (sums + counts); see seq_lattice.py
        data = jnp.concatenate([pos_rows * w[:, None], w[:, None]], axis=1)
        s = jax.ops.segment_sum(data, row_vertex, num_segments=cap)
        mean = s[:, :3] / jnp.maximum(s[:, 3:], 1.0)
        rel = pos_rows - mean[row_vertex]
    else:
        rel = pos_rows
    rel = rel * w[:, None]

    out = DistributeOut(
        row_vertex=row_vertex,
        row_bary=row_bary,
        row_rel_pos=rel,
        row_valid=row_valid,
        point_vertex=row_vertex.reshape(p, dp1),
        point_bary=row_bary.reshape(p, dp1),
    )
    return new_table, out


class NeighborTable(NamedTuple):
    """One-hop adjacency of every vertex in a table.

    ``idx[:, :2(d+1)]`` are the one-hop neighbors (0 where absent),
    ``idx[:, -1]`` is the vertex itself (the reference's im2row places the
    center LAST -- lattice_modules.py:320,327).
    """

    idx: jax.Array    # (C, 2(d+1)+1) int32 stable indices
    found: jax.Array  # (C, 2(d+1)+1) bool


@flax.struct.dataclass
class FrameStructures:
    """Per-frame lattice structures built OUTSIDE the model (the streaming
    fast path: incremental neighbor/link updates between frames).  Injected
    through ``LNNSeq.__call__(pre=(structures, dist))`` like the
    whole-sequence ``SeqLattice``.

    ``overflowed`` is True once any frame's per-level growth exceeded the
    incremental path's ``max_new`` bound: vertices beyond the bound carry
    no adjacency/link rows, permanently (append-only), so results are
    degraded -- callers MUST check it (sticky across frames) and fall back
    to the full build / a larger bound."""

    nbrs: tuple          # NeighborTable per level
    links: tuple         # LevelLink per downsample
    counts: tuple        # () int32 per level
    overflowed: jax.Array = flax.struct.field(
        default_factory=lambda: jnp.asarray(False))


def build_neighbor_table(table: VertexTable) -> NeighborTable:
    """Batched binary-search of all +/- offset keys; one per level per frame.

    Replaces the per-conv CUDA neighborhood walk; all convolutions and the
    AFlow module at a given level reuse the same table within a frame.
    """
    cap, d = table.keys.shape
    offs = jnp.asarray(pm.neighbor_offsets(d))            # (2(d+1), d)
    n_off = offs.shape[0]

    queries = (table.keys[:, None, :] + offs[None, :, :]).reshape(cap * n_off, d)
    # Rows with sentinel keys overflow on +offs; lookup guards via equality,
    # but ensure we never wrap around int32: sentinel + small offset stays huge.
    nbr = lookup(table, queries).reshape(cap, n_off)

    valid_self = table.keys[:, 0] != jnp.int32(2**31 - 1)
    self_idx = jnp.arange(cap, dtype=jnp.int32)
    idx = jnp.concatenate([jnp.maximum(nbr, 0), self_idx[:, None]], axis=1)
    found = jnp.concatenate(
        [nbr >= 0, valid_self[:, None]], axis=1)
    found &= valid_self[:, None]
    return NeighborTable(idx=idx, found=found)


def update_neighbor_table(table: VertexTable, nbr: NeighborTable,
                          old_count, max_new: int) -> NeighborTable:
    """Incrementally extend a NeighborTable after an append-only union.

    The streaming path rebuilds the full adjacency every frame
    (build_neighbor_table: capacity x 8 lookups); but consecutive LiDAR
    frames add only ~5-6k new vertices to a ~30k table, so frames t >= 1
    only need (a) adjacency ROWS for the new vertices -- a static
    ``max_new`` x 8 block of lookups -- and (b) the REVERSE taps of their
    found neighbors: key_v + off[a] == key_j implies key_j + off[(a+4)%8]
    == key_v (offsets come in +/- pairs, neighbor_offsets ordering), a
    small scatter.  New-new pairs are written by both (a) sides; old-old
    pairs are untouched.

    Args:
      table: the vertex table AFTER the union.
      nbr: adjacency valid for the first ``old_count`` stable slots.
      old_count: traced count before the union.
      max_new: static bound on new vertices this frame.  If more were
        added, rows beyond the bound get no adjacency update -- callers
        must size max_new from data (see utils/autotune.py occupancy
        deltas) or fall back to build_neighbor_table.

    Returns the updated NeighborTable.
    """
    cap, d = table.keys.shape
    n_off = 2 * (d + 1)
    offs = jnp.asarray(pm.neighbor_offsets(d))

    # (a) adjacency rows for the (static-size) new block
    rows = old_count + jnp.arange(max_new, dtype=jnp.int32)
    rows_c = jnp.minimum(rows, cap - 1)
    in_new = rows < table.count
    new_keys = table.keys[rows_c]                       # (max_new, d)
    queries = (new_keys[:, None, :] + offs[None, :, :]).reshape(
        max_new * n_off, d)
    hit = lookup(table, queries).reshape(max_new, n_off)
    hit = jnp.where(in_new[:, None], hit, -1)

    valid_self = in_new & (new_keys[:, 0] != jnp.int32(2**31 - 1))
    idx_rows = jnp.concatenate([jnp.maximum(hit, 0), rows_c[:, None]], axis=1)
    found_rows = jnp.concatenate([hit >= 0, valid_self[:, None]], axis=1)
    found_rows &= valid_self[:, None]

    dst = jnp.where(in_new, rows_c, cap)
    idx = nbr.idx.at[dst].set(idx_rows, mode="drop")
    found = nbr.found.at[dst].set(found_rows, mode="drop")

    # (b) reverse taps on the found neighbors
    rev_tap = (jnp.arange(n_off, dtype=jnp.int32) + (d + 1)) % n_off
    j = jnp.where(hit >= 0, hit, cap)                   # (max_new, n_off)
    tap = jnp.broadcast_to(rev_tap[None, :], (max_new, n_off))
    flat_dst = (j * (n_off + 1) + tap).reshape(-1)
    v_src = jnp.broadcast_to(rows_c[:, None], (max_new, n_off)).reshape(-1)
    idx = idx.reshape(-1).at[flat_dst].set(v_src, mode="drop").reshape(
        cap, n_off + 1)
    found = found.reshape(-1).at[flat_dst].set(True, mode="drop").reshape(
        cap, n_off + 1)
    return NeighborTable(idx=idx, found=found)


def mask_rows(values: jax.Array, count) -> jax.Array:
    """Zero all rows >= count and the reserved row 0.

    The core cleanliness invariant: vertex-value arrays are exactly zero
    outside the occupied range so convolution gathers, group-norm statistics
    and temporal fusion never see garbage.  Zeroing row 0 reproduces the
    reference's invalid-bucket zeroing (lattice_modules.py:569-570).
    """
    cap = values.shape[0]
    rows = jnp.arange(cap, dtype=jnp.int32)
    keep = (rows < count) & (rows > 0)
    return jnp.where(keep[:, None], values, 0.0)


# adjoint tap pairing: neighbor_offsets lists [+o_0..+o_d, -o_0..-o_d], so
# "i sees j at tap k" <=> "j sees i at tap (k + d+1) % 2(d+1)"
_PAIR_3D = tuple((k + 4) % 8 for k in range(8))


@jax.custom_vjp
def _gather8_sym(values: jax.Array, idx8: jax.Array) -> jax.Array:
    """Neighborhood gather (C, 8, Cin) whose VJP is ANOTHER gather.

    The default VJP of a gather is a scatter-add (~30 ns/row on TPU, the
    measured floor -- CLAUDE.md); but the one-hop offsets come in +/- pairs,
    so the transpose relation "who references row j at tap k" is exactly
    ``idx8[j, pair(k)]``: the cotangent is a gather through the SAME table
    with permuted taps (~2.6 ns/row).  Requires idx8 in neighbor_offsets
    order (true for build_neighbor_table and seq_lattice._build_level) and
    zero-cotangent rows 0 / >= count upstream (the mask_rows invariant's
    VJP guarantees both).
    """
    return values[idx8]


def _gather8_sym_fwd(values, idx8):
    return values[idx8], idx8


def _gather8_sym_bwd(idx8, dg):
    # ONE flat gather over the (C*8, Cin) view at indices inv*8 + tap
    # instead of 8 per-tap gathers (r5 xplane trace: the per-tap form cost
    # 0.7-0.9 ms EACH at (36864, 8, 64) -- 8 latency-bound passes per conv
    # backward, ~4x the forward's single fused 8-tap gather; the flat form
    # is that same single-gather shape)
    cap, _, cin = dg.shape
    inv = idx8[:, list(_PAIR_3D)]                            # (C, 8)
    fi = inv * 8 + jnp.arange(8, dtype=idx8.dtype)[None, :]
    g = dg.reshape(cap * 8, cin)[fi]                         # (C, 8, Cin)
    acc = jnp.sum(jnp.where((inv > 0)[..., None],
                            g.astype(jnp.float32), 0.0), axis=1)
    return acc.astype(dg.dtype), None


_gather8_sym.defvjp(_gather8_sym_fwd, _gather8_sym_bwd)


def gather_rowified(values: jax.Array, nbr: NeighborTable,
                    apply_mask: bool = False) -> jax.Array:
    """Im2row: (C, K*Cin) matrix of each vertex's neighborhood features.

    Missing neighbors contribute zeros (the CUDA im2row's behaviour for
    -1 indices) WITHOUT an explicit mask multiply: absent neighbors index
    slot 0 and out-of-frame neighbors index rows >= count, both of which are
    exactly zero under the mask_rows invariant.  Pass ``apply_mask=True``
    only for value arrays that do not satisfy the invariant.
    """
    cap = values.shape[0]
    k = nbr.idx.shape[1]
    # center-last layout: idx[:, -1] is the row itself, so its "gather" is
    # the identity -- concatenate the array instead of indexing it.  Row
    # gathers cost ~2.6 ns/row regardless of width (CLAUDE.md), so skipping
    # the center tap removes 1/9 of the indexed rows of every conv.
    if k == 9:
        g = _gather8_sym(values, nbr.idx[:, :8])         # gather-adjoint VJP
    else:
        g = values[nbr.idx[:, : k - 1]]
    g = jnp.concatenate([g, values[:, None, :]], axis=1)
    if apply_mask:
        g = g * nbr.found[..., None]
    # named for selective rematerialisation: the (C, 9*Cin) rowified arrays
    # are the largest activations of the network (9x their source rows);
    # engine remat_mode="selective" recomputes exactly these in the
    # backward (a ~2.6 ns/row gather) and saves everything else
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(g.reshape(cap, -1), "lattice_conv_rows")


def lattice_conv(values: jax.Array, nbr: NeighborTable, weight: jax.Array,
                 count, bias: jax.Array | None = None) -> jax.Array:
    """One-hop lattice convolution: gather -> (C, K*Cin) @ (K*Cin, Cout).

    The direct analog of ``ConvLatticeModule`` (im2row + matmul,
    lattice_modules.py:299-301,573) as a single MXU contraction.
    """
    rows = gather_rowified(values, nbr)
    out = jnp.dot(rows, weight, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return mask_rows(out, count)


# ---------------------------------------------------------------------------
# Coarsen / finefy
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class LevelLink:
    """Barycentric coupling between a fine level and the next coarser one.

    A fine vertex's key IS its elevated position, so key*0.5 lies on the
    coarse hyperplane; its enclosing coarse simplex gives d+1 corner indices
    and weights.  Downsampling splats through this link, upsampling slices
    back through it -- the TPU-native form of the reference's "divide the
    keys by 2" rule (LatticeNet, arXiv 1912.05905; applied through
    GnReluCoarsen/GnReluFinefy at models.py:353,398).  Unlike a one-hop
    gather around 2K (which cannot reach parents in mismatched remainder
    classes), the simplex coupling covers every fine vertex exactly.
    """

    corner_idx: jax.Array    # (Cf, d+1) int32 coarse stable indices
    corner_bary: jax.Array   # (Cf, d+1) f32 weights (0 rows for invalid fine)
    # Optional dst-sorted view (augment_link_sorted): turns each coarsen
    # splat from a (Cf*4)-row scatter-add (~30 ns/row, the TPU floor) into
    # gather + one-pass segmented sum + tail gather.  Built ONCE per
    # sequence (the link is static across frames), reused by every frame.
    sorted_src: jax.Array | None = None   # (Cf*4,) i32 fine row per entry
    sorted_w: jax.Array | None = None     # (Cf*4,) f32 bary per entry
    sorted_dst: jax.Array | None = None   # (Cf*4,) i32 nondecreasing dst
    tailpos: jax.Array | None = None      # (Cc,) i32 last entry position
    tail_live: jax.Array | None = None    # (Cc,) bool dst has entries


def augment_link_sorted(link: LevelLink, coarse_cap: int) -> LevelLink:
    """Attach the dst-sorted splat view to a LevelLink.

    One (dst, entry, bary) 3-operand sort + a tail compaction (sort +
    <= Cc-row scatter) per sequence; every subsequent splat_to_coarse of
    the link rides sorted runs instead of scattering.
    """
    cf, dp1 = link.corner_idx.shape
    n = cf * dp1
    dst = link.corner_idx.reshape(-1).astype(jnp.uint32)
    entry = jnp.arange(n, dtype=jnp.int32)
    d_s, e_s, w_s = jax.lax.sort(
        (dst, entry, link.corner_bary.reshape(-1)), dimension=0, num_keys=1)
    tail = jnp.concatenate([d_s[1:] != d_s[:-1], jnp.ones((1,), bool)])
    # compact the tails (sort pushes non-tails to the end), then scatter
    # only <= Cc rows -- not the full n
    pos = jnp.arange(n, dtype=jnp.int32)
    hk = jnp.where(tail, d_s, jnp.uint32(0xFFFFFFFF))
    d_t, p_t = jax.lax.sort((hk, pos), dimension=0, num_keys=1)
    m = min(coarse_cap, n)
    # 0xFFFFFFFF -> -1 as int32 -> dropped by the scatter
    dd = d_t[:m].astype(jnp.int32)
    tp = jnp.zeros((coarse_cap,), jnp.int32).at[dd].set(p_t[:m], mode="drop")
    live = jnp.zeros((coarse_cap,), bool).at[dd].set(True, mode="drop")
    return LevelLink(corner_idx=link.corner_idx,
                     corner_bary=link.corner_bary,
                     sorted_src=e_s // dp1, sorted_w=w_s,
                     sorted_dst=d_s.astype(jnp.int32),
                     tailpos=tp, tail_live=live)


def grow_coarse_table(fine_table: VertexTable, coarse_table: VertexTable):
    """Union every fine vertex's coarse-simplex corners into the (carried)
    coarse table and return the coupling.

    Append-only, so coarse vertex indices are stable across frames --
    strictly stronger than the reference's fresh-per-frame CUDA hashtable,
    whose stability relied on deterministic insert order (SURVEY.md 3.3).
    """
    cap, d = fine_table.keys.shape
    dp1 = d + 1
    valid = fine_table.keys[:, 0] != jnp.int32(2**31 - 1)
    key_f = jnp.where(valid[:, None], fine_table.keys, 0).astype(jnp.float32)
    full = jnp.concatenate([key_f, -key_f.sum(-1, keepdims=True)], axis=-1)
    ckeys, cbary = pm.find_enclosing_simplex(full * 0.5)   # (Cf, d+1, d)

    flat_keys = ckeys.reshape(cap * dp1, d)
    flat_valid = jnp.repeat(valid, dp1)
    new_coarse, flat_idx = union_and_index(coarse_table, flat_keys, flat_valid)

    corner_idx = flat_idx.reshape(cap, dp1)
    corner_bary = jnp.where(valid[:, None] & (corner_idx > 0), cbary, 0.0)
    return new_coarse, LevelLink(corner_idx=corner_idx, corner_bary=corner_bary)


def grow_coarse_table_incremental(fine_table: VertexTable,
                                  coarse_table: VertexTable,
                                  old_fine_count, link: LevelLink,
                                  max_new: int):
    """Incremental form of :func:`grow_coarse_table`: union only the coarse
    corners of the (static ``max_new``-bounded) NEW fine vertices and patch
    their rows into the carried LevelLink.  Old fine vertices' corners are
    unchanged by append-only growth.  Pairs with
    :func:`update_neighbor_table` for the streaming fast path."""
    cap, d = fine_table.keys.shape
    dp1 = d + 1
    rows = old_fine_count + jnp.arange(max_new, dtype=jnp.int32)
    rows_c = jnp.minimum(rows, cap - 1)
    in_new = rows < fine_table.count
    keys_f = fine_table.keys[rows_c]
    valid = in_new & (keys_f[:, 0] != jnp.int32(2**31 - 1))
    key_f = jnp.where(valid[:, None], keys_f, 0).astype(jnp.float32)
    full = jnp.concatenate([key_f, -key_f.sum(-1, keepdims=True)], axis=-1)
    ckeys, cbary = pm.find_enclosing_simplex(full * 0.5)

    new_coarse, flat_idx = union_and_index(
        coarse_table, ckeys.reshape(max_new * dp1, d), jnp.repeat(valid, dp1))
    corner_idx = flat_idx.reshape(max_new, dp1)
    corner_bary = jnp.where(valid[:, None] & (corner_idx > 0), cbary, 0.0)

    dst = jnp.where(in_new, rows_c, cap)
    link = LevelLink(
        corner_idx=link.corner_idx.at[dst].set(corner_idx, mode="drop"),
        corner_bary=link.corner_bary.at[dst].set(corner_bary, mode="drop"))
    return new_coarse, link


def splat_to_coarse(fine_values: jax.Array, link: LevelLink,
                    coarse_cap: int) -> jax.Array:
    """Barycentric splat of fine vertex features onto the coarse level.

    With an augmented link (augment_link_sorted) the splat is gather +
    one-pass segmented sum + tail gather over dst-sorted entries instead
    of a (Cf*4)-row scatter-add; numerically it differs from the scatter
    only in f32 summation order.
    """
    if link.sorted_src is not None and 128 % fine_values.shape[-1] == 0:
        return _splat_sorted(fine_values, link.sorted_src, link.sorted_w,
                             link.sorted_dst, link.tailpos, link.tail_live,
                             link.corner_idx, link.corner_bary)
    cf, dp1 = link.corner_idx.shape
    contrib = fine_values[:, None, :] * link.corner_bary[..., None]
    flat = contrib.reshape(cf * dp1, -1)
    ids = link.corner_idx.reshape(-1)
    return jax.ops.segment_sum(flat, ids, num_segments=coarse_cap)


def _splat_sorted_impl(fine_values, src, w, dst, tailpos, live):
    from . import seq_lattice as sl
    rows = fine_values[src] * w[:, None]
    if sl._use_pallas_scans():
        from . import pallas_scan as ps
        scanned = ps.sorted_segment_scan(dst, rows, "sum")
    else:
        head = jnp.concatenate([jnp.ones((1,), bool), dst[1:] != dst[:-1]])
        scanned = sl._seg_sum_rows(head, rows)
    return scanned[tailpos] * live[:, None]


@jax.custom_vjp
def _splat_sorted(fine_values, src, w, dst, tailpos, live,
                  corner_idx, corner_bary):
    return _splat_sorted_impl(fine_values, src, w, dst, tailpos, live)


def _splat_sorted_fwd(fine_values, src, w, dst, tailpos, live,
                      corner_idx, corner_bary):
    out = _splat_sorted_impl(fine_values, src, w, dst, tailpos, live)
    return out, (corner_idx, corner_bary, w, fine_values)


def _splat_sorted_bwd(res, d_out):
    """The splat is linear in fine_values; its exact transpose is the
    barycentric slice (slice_to_fine): a gather, never a scatter."""
    corner_idx, corner_bary, w, fine_values = res
    g = d_out[corner_idx]                                  # (Cf, d+1, C)
    d_fine = jnp.einsum("fvc,fv->fc", g, corner_bary)
    return (d_fine, None, jnp.zeros_like(w), None, None, None, None,
            jnp.zeros_like(corner_bary))


_splat_sorted.defvjp(_splat_sorted_fwd, _splat_sorted_bwd)


@jax.custom_vjp
def _slice_sorted(coarse_values, corner_idx, corner_bary, src, w, dst,
                  tailpos, live):
    g = coarse_values[corner_idx]                         # (Cf, d+1, C)
    return jnp.einsum("fvc,fv->fc", g, corner_bary)


def _slice_sorted_fwd(coarse_values, corner_idx, corner_bary, src, w, dst,
                      tailpos, live):
    g = coarse_values[corner_idx]
    return jnp.einsum("fvc,fv->fc", g, corner_bary), \
        (corner_bary, src, w, dst, tailpos, live)


def _slice_sorted_bwd(res, d_fine):
    """The slice is linear in coarse_values; its exact transpose is the
    barycentric splat -- ridden on the link's dst-sorted view (gather +
    one-pass segmented sum + tail gather) instead of XLA's (Cf*4)-row
    scatter-add VJP (~30 ns/row, the TPU floor).  Mirror image of
    ``_splat_sorted_bwd``; differs from the scatter only in f32 summation
    order.  corner_bary's cotangent is reported zero: barycentric weights
    derive from point positions, which nothing differentiates."""
    corner_bary, src, w, dst, tailpos, live = res
    d_coarse = _splat_sorted_impl(d_fine, src, w, dst, tailpos, live)
    return (d_coarse, None, jnp.zeros_like(corner_bary), None,
            jnp.zeros_like(w), None, None, None)


_slice_sorted.defvjp(_slice_sorted_fwd, _slice_sorted_bwd)


def slice_to_fine(coarse_values: jax.Array, link: LevelLink) -> jax.Array:
    """Barycentric slice of coarse vertex features back onto fine vertices
    (the transpose of splat_to_coarse).

    With an augmented link the BACKWARD uses the dst-sorted splat (see
    ``_slice_sorted_bwd``); the forward gather is identical either way."""
    if (link.sorted_src is not None
            and link.tailpos.shape[0] == coarse_values.shape[0]
            and 128 % coarse_values.shape[-1] == 0):
        return _slice_sorted(coarse_values, link.corner_idx,
                             link.corner_bary, link.sorted_src,
                             link.sorted_w, link.sorted_dst, link.tailpos,
                             link.tail_live)
    g = coarse_values[link.corner_idx]                    # (Cf, d+1, C)
    return jnp.einsum("fvc,fv->fc", g, link.corner_bary)


# ---------------------------------------------------------------------------
# Slice
# ---------------------------------------------------------------------------

def slice_gather(values: jax.Array, point_vertex: jax.Array,
                 point_bary: jax.Array) -> jax.Array:
    """Barycentric slice-back: per point, gather its d+1 simplex-vertex
    features weighted by (possibly deformed) barycentric weights.

    Invalid rows have bary 0 and index 0 (whose features are zero), so no
    extra masking is needed.
    """
    g = values[point_vertex]                             # (P, d+1, C)
    return jnp.einsum("pvc,pv->pc", g, point_bary)


def slice_classic(values: jax.Array, point_vertex: jax.Array,
                  point_bary: jax.Array) -> jax.Array:
    """Classic (non-deform, non-classifying) slice: the TPU equivalent of the
    reference's ``SliceLatticeModule`` alternate (constructed at
    /root/reference/seq_lattice/models.py:233, called only in commented-out
    code at models.py:466-467).  Plain barycentric interpolation of vertex
    features at the points; pair with a ``Conv1x1`` head to reproduce the
    commented ``self.classify`` path."""
    return slice_gather(values, point_vertex, point_bary)


def splat_classic(point_values: jax.Array, point_vertex: jax.Array,
                  point_bary: jax.Array, capacity: int) -> jax.Array:
    """Classic splat: barycentric-weighted scatter of per-point features onto
    the simplex vertices -- the ``SplatLatticeModule`` alternate
    (/root/reference/seq_lattice/models.py:234; never called in the
    reference forward).  The adjoint of :func:`slice_classic`.

    Args:
      point_values: (P, C) per-point features.
      point_vertex: (P, d+1) int32 simplex vertex indices (0 = invalid).
      point_bary:   (P, d+1) f32 weights (0 for invalid corners).

    Returns (capacity, C) vertex features; row 0 collects invalid mass and is
    zeroed per the mask_rows invariant.
    """
    p, dp1 = point_vertex.shape
    contrib = point_values[:, None, :] * point_bary[..., None]  # (P, d+1, C)
    flat = contrib.reshape(p * dp1, -1)
    out = jax.ops.segment_sum(flat, point_vertex.reshape(-1),
                              num_segments=capacity)
    return out.at[0].set(0.0)
