"""Pallas TPU kernel: single-pass segmented max over contiguous sub-runs.

The batched pointnet reduces (Q, C) packed uint32 rows to per-bucket
maxima, where buckets are CONTIGUOUS sub-runs of the union-sorted order.
Pure-XLA options both move too many bytes:

* ``segment_max`` scatter: ~15 ns per indexed row (serial scatter);
* blocked ``associative_scan``: log2(block)+1 full passes over Q*C*4 B
  (~8x the traffic of one pass; measured +58 ms/seq at C=64, Q=2M).

This kernel makes exactly ONE pass over the data: a sequential grid walks
row-tiles in order (TPU grids execute in order on a core), computes an
in-VMEM inclusive segmented max down the tile with log2(tile) sublane
shifts, and carries the running (max, run id) across tiles in scratch.
Segments are identified by a GLOBAL head-count array (cumsum of head
flags, computed outside with the cheap blocked cumsum): equal count ==
same run, which removes any in-kernel prefix computation over flags.

Output rows hold the inclusive segmented running max, so each bucket's
result sits at its tail row, exactly like the associative_scan version
(ops/segment.sorted_packed_max extracts tails by position).

uint32 ordering rides int32 hardware max via the sign-flip bitcast
(x ^ 0x80000000 is order-isomorphic u32 -> i32).

Reference analog: torch_scatter ``scatter_max``
(/root/reference/seq_lattice/lattice_modules.py:512-525), restructured for
contiguous sorted runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INT_MIN = -0x80000000


def _unpacked_maxscan() -> bool:
    """r5 default: run the c<=64 segmented max on the native (tile, C)
    kernel, trading half the VPU lane occupancy for ZERO host-side layout
    copies/reshapes.  The xplane trace showed the packed path's "free"
    (Q,C)<->(Q/2,2C) reshapes are PHYSICAL under TPU tiling; A/B at bench
    scale: unpacked 0.15173 s/seq vs packed 0.15287 (median of 3 each,
    spread 0.1%).  TLN_MAXSCAN_PACKED=1 restores the packed path."""
    import os
    return os.environ.get("TLN_MAXSCAN_PACKED", "0") != "1"


def pltpu_roll(x, shift):
    """Shift rows DOWN by ``shift`` along axis 0 (circular; callers mask
    the wrapped rows).  Uses the TPU sublane rotate when available."""
    try:
        from jax.experimental.pallas import tpu as pltpu
        return pltpu.roll(x, shift, 0)
    except Exception:
        return jnp.roll(x, shift, axis=0)


def pltpu_roll_lanes(x, shift):
    """Circular lane rotate (axis 1) by ``shift``."""
    try:
        from jax.experimental.pallas import tpu as pltpu
        return pltpu.roll(x, shift, 1)
    except Exception:
        return jnp.roll(x, shift, axis=1)


def _seg_max_kernel(hc_ref, x_ref, out_ref, carry_ref, prev_hc_ref,
                    tile: int, window: int | None = None):
    """Generic path: Hillis-Steele straight down the sublanes.

    ``window`` (in PACKED-row units, matching the packed kernel's
    parameter) caps the doubling at 2*window ORIGINAL rows: every row then
    covers at least its last 2*window same-run rows -- a strictly stronger
    guarantee than the packed kernel's (whose LO rows cover 2*window-1),
    so the two-level chunk-summary correction (segment.py) stays valid."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref[:], INT_MIN)
        prev_hc_ref[0, 0] = -1

    x = x_ref[:]                                  # (tile, C) int32
    hc = hc_ref[:]                                # (tile, 1) int32 run ids

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    limit = tile if window is None else min(2 * window, tile)
    step = 1
    while step < limit:
        x_up = pltpu_roll(x, step)
        hc_up = pltpu_roll(hc, step)
        same = (hc_up == hc) & (rows_i >= step)
        x = jnp.where(same, jnp.maximum(x, x_up), x)
        step *= 2

    # rows continuing the previous tile's final run fold in its carry
    cont = hc == prev_hc_ref[0, 0]
    x = jnp.where(cont, jnp.maximum(x, carry_ref[:]), x)

    out_ref[:] = x
    carry_ref[:] = x[-1:, :]
    prev_hc_ref[0, 0] = hc[tile - 1, 0]


def _seg_max_kernel_packed(hc2_ref, x2_ref, out_ref, carry_ref, prev_hc_ref,
                           half: int, c: int, window: int | None = None):
    """Lane-packed path: consecutive row pairs live in one 2C-lane row so
    the VPU runs at full 128-lane width (a bare C=64 wastes half the
    lanes).  The pair's HI half carries its inclusive running max; both
    halves of later pairs fold it in.  Packing happens OUTSIDE the kernel
    (Mosaic cannot lower a (tile, C) -> (tile/2, 2C) vector reshape)."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref[:], INT_MIN)
        prev_hc_ref[0, 0] = -1

    x2 = x2_ref[:]                                # (half, 2C) int32
    hcp = hc2_ref[:]                              # (half, 2) int32 run ids
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (half, 2 * c), 1)

    # step 1 (odd rows fold their even partner): a lane rotate by C
    x_sh = pltpu_roll_lanes(x2, c)                # lane l <- lane l-C (mod)
    same1 = ((hcp[:, 0] == hcp[:, 1])[:, None]) & (lanes >= c)
    x2 = jnp.where(same1, jnp.maximum(x2, x_sh), x2)

    # steps 2, 4, ... along sublanes; a packed-row shift of s covers 2s
    # original rows.  Both halves fold the HI half of the shifted pair iff
    # their run id matches the shifted pair's last row's id.  Mosaic cannot
    # select between i1 vectors ("unsupported target bitwidth for
    # truncation"), so select the i32 comparison TARGET per lane instead:
    # lanes [0:C] compare against the pair's LO run id, lanes [C:2C]
    # against its HI run id.
    # ``window`` caps the doubling at W packed rows: every row's coverage
    # is then AT LEAST [max(head, row - 2W + 2), row] original rows (HI
    # rows get the full 2W window; tile-opening rows extend through the
    # carry, which itself spans a window before the tile).  The two-level
    # wrapper (segment.py) fixes longer runs from chunk summaries.
    limit = half if window is None else min(window, half)
    hc_hi = hcp[:, 1:]
    hc_lane = jnp.where(lanes < c, hcp[:, :1], hc_hi)   # (half, 2C) i32
    step = 1
    while step < limit:
        xh = jnp.concatenate([x2[:, c:], x2[:, c:]], axis=1)
        x_up = pltpu_roll(xh, step)
        hi_up = pltpu_roll(hc_hi, step)
        same = (hi_up == hc_lane) & (rows_i >= step)
        x2 = jnp.where(same, jnp.maximum(x2, x_up), x2)
        step *= 2

    # fold the previous tile's carry (last original row's running max)
    prev = prev_hc_ref[0, 0]
    carr = carry_ref[:]                           # (1, C)
    cboth = jnp.concatenate([carr, carr], axis=1)
    x2 = jnp.where(hc_lane == prev, jnp.maximum(x2, cboth), x2)

    out_ref[:] = x2
    carry_ref[:] = x2[-1:, c:]
    prev_hc_ref[0, 0] = hcp[half - 1, 1]


def sorted_segment_max_i32(head_count: jax.Array, x: jax.Array,
                           tile: int = 2048,
                           interpret: bool = False,
                           max_window: int | None = None) -> jax.Array:
    """Inclusive segmented max of int32 rows over contiguous runs.

    Args:
      head_count: (Q,) int32 nondecreasing run ids (e.g. inclusive cumsum
        of head flags); rows with equal values form one run.
      x: (Q, C) int32.
      max_window: optional doubling cap in PACKED rows (power of two,
        c <= 64 path only).  The output is then a WINDOWED segmented max:
        row t covers at least the last ``2*max_window - 1`` same-run rows
        (2*max_window for odd/HI rows) instead of the whole run -- the
        two-level tail max (segment.sorted_packed_max) corrects long runs
        from chunk summaries.  Coverage never crosses a run head.
    Returns (Q, C) int32 inclusive segmented running max.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, c = x.shape
    # NOTE (r5): tile=4096 on the unpacked path exceeds the 16 MB scoped
    # VMEM at bench scale (Mosaic reports 18.4 MB with the per-pass temps);
    # 2048 stands.
    if q % tile != 0:
        pad = tile - q % tile
        big = head_count[-1] + jnp.arange(1, pad + 1, dtype=jnp.int32)
        x = jnp.concatenate(
            [x, jnp.full((pad, c), INT_MIN, jnp.int32)], axis=0)
        head_count = jnp.concatenate([head_count, big], axis=0)
        return sorted_segment_max_i32(head_count, x, tile,
                                      interpret, max_window)[:q]

    hc = head_count.astype(jnp.int32)
    if c <= 64 and not _unpacked_maxscan():
        # lane-packed variant: pack row pairs host-side.  NOTE (r5 xplane
        # trace): the "free" host-side (Q,C)<->(Q/2,2C) reshapes are
        # PHYSICAL under TPU tiling and cost ~7 ms/seq in copies at bench
        # scale; TLN_MAXSCAN_UNPACKED=1 A/Bs the (tile, C) native kernel
        # (half VPU lane occupancy, zero layout plumbing)
        half = tile // 2
        q2 = q // 2
        out = pl.pallas_call(
            functools.partial(_seg_max_kernel_packed, half=half, c=c,
                              window=max_window),
            grid=(q2 // half,),
            in_specs=[
                pl.BlockSpec((half, 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((half, 2 * c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((half, 2 * c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((q2, 2 * c), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, c), jnp.int32),
                            pltpu.SMEM((1, 1), jnp.int32)],
            interpret=interpret,
        )(hc.reshape(q2, 2), x.reshape(q2, 2 * c))
        return out.reshape(q, c)

    out = pl.pallas_call(
        functools.partial(_seg_max_kernel, tile=tile, window=max_window),
        grid=(q // tile,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, c), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.int32),
                        pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(hc.reshape(q, 1), x)
    return out


def sorted_segment_max_u32(head_count: jax.Array, packed: jax.Array,
                           tile: int = 2048,
                           interpret: bool = False,
                           max_window: int | None = None) -> jax.Array:
    """uint32 segmented max via the order-isomorphic sign-flip to int32."""
    flip = jnp.uint32(0x80000000)
    xi = jax.lax.bitcast_convert_type(packed ^ flip, jnp.int32)
    oi = sorted_segment_max_i32(head_count, xi, tile, interpret, max_window)
    return jax.lax.bitcast_convert_type(oi, jnp.uint32) ^ flip


# ---------------------------------------------------------------------------
# Generalised one-pass segmented scan (sum / max / copy-first) for SMALL
# channel counts: G = 128 // C consecutive rows are lane-packed into one
# 128-lane vector row, so the VPU always runs at full width (a bare C=4
# would idle 97% of the lanes).  Used by the union's in-sort mean
# (_seg_sum_rows: (Q, 4) f32) and birth propagation.
# ---------------------------------------------------------------------------

_COMBINE = {
    "sum": (lambda a, b: a + b, 0),
    "max": (jnp.maximum, INT_MIN),
    # "first": a run's HEAD value propagates forward (the up/earlier value
    # replaces; see _seg_copy_head) -- identity irrelevant (fresh pad runs)
    "first": (lambda a, b: b, 0),
}


def _seg_scan_kernel_lanes(hcl_ref, x_ref, out_ref, carry_ref, prev_hc_ref,
                           rows: int, c: int, mode: str):
    """One grid step: (rows, 128) block = rows*G original rows, where
    G = 128 // c.  ``hcl`` carries each original row's run id replicated
    across its C lanes.  Phase 1 scans along lanes (within a packed row),
    phase 2 doubles down sublanes folding the packed row's LAST original
    row, phase 3 folds the previous tile's carry."""
    from jax.experimental import pallas as pl

    comb, _ident = _COMBINE[mode]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref[:]) if mode != "max" \
            else jnp.full_like(carry_ref[:], INT_MIN)
        prev_hc_ref[0, 0] = -1

    x = x_ref[:]                                   # (rows, 128)
    hcl = hcl_ref[:]                               # (rows, 128) run ids
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)

    # phase 1: Hillis-Steele along the lane axis, step = c, 2c, ...
    step = c
    while step < 128:
        x_up = pltpu_roll_lanes(x, step)
        hc_up = pltpu_roll_lanes(hcl, step)
        same = (hc_up == hcl) & (lanes >= step)
        x = jnp.where(same, comb(x_up, x) if mode != "first" else x_up, x)
        step *= 2

    # phase 2: doubling down sublanes; fold each packed row's LAST original
    # row (lanes [128-c:128] now hold its inclusive running value)
    last_ids = hcl[:, 127:]                        # (rows, 1)
    g = 128 // c
    step = 1
    while step < rows:
        xl = x[:, 128 - c:]
        xh = jnp.concatenate([xl] * g, axis=1)     # tile to all lane groups
        x_up = pltpu_roll(xh, step)
        id_up = pltpu_roll(last_ids, step)
        same = (id_up == hcl) & (rows_i >= step)
        x = jnp.where(same, comb(x_up, x) if mode != "first" else x_up, x)
        step *= 2

    # phase 3: previous tile's carry (its last original row's value + id)
    carr = carry_ref[:]                            # (1, c)
    cfull = jnp.concatenate([carr] * g, axis=1)
    cont = hcl == prev_hc_ref[0, 0]
    x = jnp.where(cont, comb(cfull, x) if mode != "first" else cfull, x)

    out_ref[:] = x
    carry_ref[:] = x[-1:, 128 - c:]
    prev_hc_ref[0, 0] = hcl[rows - 1, 127]


def _seg_scan_kernel_laneonly(hcl_ref, x_ref, out_ref, rows: int, c: int,
                              mode: str):
    """Lane-phase-only segmented scan: each packed row's G = 128 // c
    original rows scan independently (the scan RESETS at packed-row
    boundaries as well as at run heads).  No sublane phase, no carry --
    log2(G) passes instead of log2(G) + log2(rows) + 1."""
    comb, _ident = _COMBINE[mode]
    x = x_ref[:]                                   # (rows, 128)
    hcl = hcl_ref[:]                               # (rows, 128) run ids
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    step = c
    while step < 128:
        x_up = pltpu_roll_lanes(x, step)
        hc_up = pltpu_roll_lanes(hcl, step)
        same = (hc_up == hcl) & (lanes >= step)
        x = jnp.where(same, comb(x_up, x) if mode != "first" else x_up, x)
        step *= 2
    out_ref[:] = x


def sorted_segment_scan_chunked(head_count: jax.Array, x: jax.Array,
                                mode: str, rows: int = 512,
                                interpret: bool = False):
    """Per-CHUNK segmented inclusive scan, chunk = G = 128 // C original
    rows: row t covers exactly [max(run head, chunk start), t].  One
    lane-only pass (log2(G) VPU steps, no sublane doubling, no carry).

    Building block for exact tail-targeted reductions: chunk-END rows
    cover exactly their chunk's same-run rows, so a (Q/G)-row segmented
    scan over them chains whole runs without overlap (see
    ``seg_sum_tails``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, c = x.shape
    assert 128 % c == 0, c
    g = 128 // c
    chunk = rows * g
    if q % chunk != 0:
        pad = chunk - q % chunk
        big = head_count[-1] + jnp.arange(1, pad + 1, dtype=jnp.int32)
        _, ident = _COMBINE[mode]
        x = jnp.concatenate(
            [x, jnp.full((pad, c), ident, x.dtype)], axis=0)
        head_count = jnp.concatenate([head_count, big], axis=0)
        return sorted_segment_scan_chunked(head_count, x, mode, rows,
                                           interpret)[:q]

    qp = q // g
    hcl = jnp.repeat(head_count.astype(jnp.int32).reshape(qp, g), c, axis=1)
    out = pl.pallas_call(
        functools.partial(_seg_scan_kernel_laneonly, rows=rows, c=c,
                          mode=mode),
        grid=(qp // rows,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, 128), x.dtype),
        interpret=interpret,
    )(hcl, x.reshape(qp, 128))
    return out.reshape(q, c)


def seg_sum_tails(head_count: jax.Array, x: jax.Array, tails: jax.Array,
                  rows: int = 512, interpret: bool = False) -> jax.Array:
    """EXACT per-run sums of ``x`` evaluated at ``tails`` row positions.

    The one-pass inclusive scan computes a running sum at EVERY row, but
    the union's mean path only reads run totals at tail rows (the mean
    table compaction).  Two cheaper levels instead:

      1. the lane-only chunk scan: row t sums [max(head, chunk start), t]
         (G = 128 // C original rows per chunk, log2(G) passes);
      2. a (Q/G)-row segmented scan over chunk-end rows: chunk ends cover
         exactly their chunk's same-run rows, so the chain sums a run
         from its head to any chunk end -- no overlap, EXACT;
      3. per tail: total = chunk_scan[tail] + chain[previous chunk end]
         when that chunk end is the same run (4 small gathers).

    Args:
      head_count: (Q,) int32 nondecreasing run ids.
      x: (Q, C) f32, C a power of two dividing 128.
      tails: (B,) int32 row positions (garbage positions allowed; callers
        mask the output).
    Returns (B, C) per-run totals at the tail rows.
    """
    q, c = x.shape
    g = 128 // c
    capped = sorted_segment_scan_chunked(head_count, x, "sum", rows,
                                         interpret)
    summ = capped[g - 1::g]
    sids = head_count[g - 1::g]
    scanned = sorted_segment_scan(sids, summ, "sum", rows, interpret)
    base = capped[tails]
    pc = tails // g - 1
    e_row = (tails // g) * g - 1
    ok = (e_row >= 0) & (head_count[jnp.maximum(e_row, 0)]
                         == head_count[tails])
    corr = jnp.where(ok[:, None], scanned[jnp.maximum(pc, 0)],
                     jnp.zeros((), x.dtype))
    return base + corr


def sorted_segment_scan(head_count: jax.Array, x: jax.Array, mode: str,
                        rows: int = 512, interpret: bool = False):
    """Inclusive segmented scan (``mode`` in sum/max/first) over contiguous
    runs, ONE pass over the data.

    Args:
      head_count: (Q,) int32 nondecreasing run ids.
      x: (Q, C) with C a power of two <= 128 dividing 128; f32 for sum /
        first, i32 for max.
    Returns (Q, C) inclusive segmented running scan.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, c = x.shape
    assert 128 % c == 0, c
    g = 128 // c
    chunk = rows * g                                # original rows per block
    if q % chunk != 0:
        pad = chunk - q % chunk
        big = head_count[-1] + jnp.arange(1, pad + 1, dtype=jnp.int32)
        _, ident = _COMBINE[mode]
        x = jnp.concatenate(
            [x, jnp.full((pad, c), ident, x.dtype)], axis=0)
        head_count = jnp.concatenate([head_count, big], axis=0)
        return sorted_segment_scan(head_count, x, mode, rows,
                                   interpret)[:q]

    qp = q // g
    # per-LANE run ids: replicate each row's id across its c lanes
    hcl = jnp.repeat(head_count.astype(jnp.int32).reshape(qp, g), c, axis=1)
    out = pl.pallas_call(
        functools.partial(_seg_scan_kernel_lanes, rows=rows, c=c, mode=mode),
        grid=(qp // rows,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, 128), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, c), x.dtype),
                        pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(hcl, x.reshape(qp, 128))
    return out.reshape(q, c)
