"""Segment reductions (rows -> vertices), the TPU equivalent of the
``torch_scatter`` CUDA extension used by the reference
(`/root/reference/seq_lattice/lattice_modules.py:485-525`,
`/root/reference/seq_lattice/models.py:454`).

Built on ``jax.ops.segment_*`` which XLA lowers to efficient scatters.
Empty segments reduce to 0 (matching ``torch_scatter``'s zero-initialised
output buffers, which the reference's early-maxpool zero-row detection
depends on -- lattice_modules.py:556-562).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments, valid=None):
    w = jnp.ones(data.shape[0], data.dtype) if valid is None else valid.astype(data.dtype)
    sums = jax.ops.segment_sum(data * w[:, None], segment_ids, num_segments=num_segments)
    cnts = jax.ops.segment_sum(w, segment_ids, num_segments=num_segments)
    return sums / jnp.maximum(cnts, 1.0)[:, None]


def _packed_max_impl(data, bary, segment_ids, num_segments, valid):
    """Per-segment, per-channel max of bf16 ``data`` plus the barycentric
    weight of the winning row -- in ONE scatter pass.

    The reference couples ``scatter_max`` with an argmax-indexed gather of
    the barycentric column (lattice_modules.py:512-525); on TPU that chain
    costs three extra index-bound passes over (R, C) / (S, C) arrays
    (gather max back to rows, scatter row-ids, gather bary by argmax --
    profiled in scripts/profile_r2.py).  Packing the value's bf16 bits
    (monotone-mapped) into the high 16 bits of a uint32 and the quantised
    bary into the low 16 lets a single ``segment_max`` carry both.

    Semantics vs the reference: value max is exact in bf16 (the compute
    dtype of this path); ties in the value pick the larger bary instead of
    torch_scatter's row order (immaterial downstream, cf. segment.py
    argmax note); bary is quantised to 1/65535 (documented in PARITY.md).
    Empty segments yield (0, 0) like torch_scatter's zero-filled output.

    Args:
      data: (R, C) rows, cast to bf16.
      bary: (R,) f32 in [0, 1].
      valid: optional (R,) bool; invalid rows never win.

    Returns: (maxval (S, C) f32, bary_sel (S, C) f32).
    """
    bits = jax.lax.bitcast_convert_type(
        data.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    # monotone map: order of mapped uint16s == numeric order of the floats
    mono = jnp.where(bits >= 0x8000, bits ^ jnp.uint32(0xFFFF),
                     bits | jnp.uint32(0x8000))
    b16 = (jnp.clip(bary, 0.0, 1.0) * 65535.0 + 0.5).astype(jnp.uint32)
    packed = (mono << 16) | b16[:, None]
    if valid is not None:
        packed = jnp.where(valid[:, None], packed, 0)
    best = jax.ops.segment_max(packed, segment_ids,
                               num_segments=num_segments)
    # 0 is unreachable for a real row (mono 0 would be the bf16 bit pattern
    # 0xFFFF = -nan), so 0 == empty segment (u32 max identity).
    has = best != 0
    mono_out = best >> 16
    bits_out = jnp.where(mono_out >= 0x8000, mono_out ^ jnp.uint32(0x8000),
                         mono_out ^ jnp.uint32(0xFFFF)).astype(jnp.uint16)
    mx = jax.lax.bitcast_convert_type(bits_out, jnp.bfloat16).astype(jnp.float32)
    mx = jnp.where(has, mx, 0.0)
    bary_sel = jnp.where(has, (best & 0xFFFF).astype(jnp.float32) / 65535.0,
                         0.0)
    return mx, bary_sel, packed, best


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def segment_max_with_bary_packed(data, bary, segment_ids, num_segments,
                                 valid=None):
    out = _packed_max_impl(data, bary, segment_ids, num_segments, valid)
    return out[0], out[1]


def _packed_max_fwd(data, bary, segment_ids, num_segments, valid):
    mx, bary_sel, packed, best = _packed_max_impl(
        data, bary, segment_ids, num_segments, valid)
    return (mx, bary_sel), (packed, best, segment_ids,
            jnp.zeros((0,), data.dtype))


def _packed_max_bwd(num_segments, res, cots):
    """Straight-through max gradient: the cotangent of each segment/channel
    flows to its winning row -- ONE GATHER by segment id, no scatter.

    The packed forward is built from bitcasts (non-differentiable in XLA),
    so without this VJP the pointnet MLP under bf16 receives exactly zero
    gradient (caught in round 3; tests/test_segment.py pins it).  Ties in
    the packed uint32 (same bf16 value AND same quantised bary) would give
    the gradient to every tied row where torch_scatter picks one; exact
    ties are vanishingly rare (documented in PARITY.md).
    """
    packed, best, segment_ids, dtype_token = res
    dmx, dbary_sel = cots
    sel_best = best[segment_ids]
    winner = (packed == sel_best) & (sel_best != 0)
    ddata = jnp.where(winner, dmx[segment_ids], 0.0).astype(dtype_token.dtype)
    dbary = jnp.where(winner, dbary_sel[segment_ids], 0.0).sum(-1)
    return ddata, dbary, None, None


segment_max_with_bary_packed.defvjp(_packed_max_fwd, _packed_max_bwd)


def segment_max_with_argmax(data, segment_ids, num_segments, valid=None):
    """Per-segment, per-channel max and the winning row index.

    Matches ``torch_scatter.scatter_max`` semantics as used at
    lattice_modules.py:512-525: empty segments yield 0 and argmax -1.

    Args:
      data: (R, C) f32 rows.
      segment_ids: (R,) int32 in [0, num_segments).
      valid: optional (R,) bool; invalid rows never win.

    Returns: (maxval (S, C), argmax (S, C) int32 with -1 for empty).
    """
    neg = jnp.asarray(-jnp.inf, data.dtype)
    masked = data if valid is None else jnp.where(valid[:, None], data, neg)
    mx = jax.ops.segment_max(masked, segment_ids, num_segments=num_segments)
    has = jnp.isfinite(mx)
    mxz = jnp.where(has, mx, 0.0)

    # Recover argmax: rows equal to their segment's max win; take the
    # largest row id among ties (tie choice is immaterial downstream).
    winner = masked == mx[segment_ids]
    if valid is not None:
        winner &= valid[:, None]
    rows = jnp.arange(data.shape[0], dtype=jnp.int32)[:, None]
    arg = jax.ops.segment_max(jnp.where(winner, rows, -1), segment_ids,
                              num_segments=num_segments)
    arg = jnp.where(has, arg, -1)
    return mxz, arg.astype(jnp.int32)


def _pack_value_bary(data, bary, live):
    """bf16 value bits (monotone-mapped) in the high 16, quantised bary in
    the low 16; 0 for dead rows (the u32-max identity)."""
    bits = jax.lax.bitcast_convert_type(
        data.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    mono = jnp.where(bits >= 0x8000, bits ^ jnp.uint32(0xFFFF),
                     bits | jnp.uint32(0x8000))
    b16 = (jnp.clip(bary, 0.0, 1.0) * 65535.0 + 0.5).astype(jnp.uint32)
    packed = (mono << 16) | b16[:, None]
    return jnp.where(live[:, None], packed, 0)


def _decode_packed(best):
    has = best != 0
    mono_out = best >> 16
    bits_out = jnp.where(mono_out >= 0x8000, mono_out ^ jnp.uint32(0x8000),
                         mono_out ^ jnp.uint32(0xFFFF)).astype(jnp.uint16)
    mx = jax.lax.bitcast_convert_type(bits_out, jnp.bfloat16
                                      ).astype(jnp.float32)
    mx = jnp.where(has, mx, 0.0)
    bary_sel = jnp.where(has, (best & 0xFFFF).astype(jnp.float32) / 65535.0,
                         0.0)
    return mx, bary_sel


def _seg_max_full_scan(head, packed):
    """Full (Q, C) inclusive segmented max (the pre-two-level path; kept
    for row counts the chunked layout cannot express)."""
    from . import seq_lattice as sl

    if jax.default_backend() != "cpu":
        from . import pallas_scan as ps
        hc = sl._blocked_cumsum(head.astype(jnp.int32))
        return ps.sorted_segment_max_u32(hc, packed)

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb[..., None], vb,
                                  jnp.maximum(va, vb))
    return sl._blocked_seg_scan(comb, head, packed)


def _seg_max_tails_twolevel(head, packed, tails, chunk: int = 16,
                            interpret: bool = False, head_count=None):
    """Per-tail segment max via a WINDOWED Pallas scan + chunk-summary
    correction (both levels stay in the kernel, unlike the measured-slower
    XLA-intra-chunk variant of scripts/profile_tailmax.py).

    Sub-runs average ~10 rows at bench scale, so the one-pass kernel's
    full log2(tile) Hillis-Steele doubling (11 VPU passes over Q*C*4 B)
    mostly combines nothing.  Capping the doubling at ``chunk`` original
    rows (4 passes at chunk=16) makes every row's value cover at least its
    last ``chunk-1`` same-run rows; chunk-END rows (always HI rows of a
    packed pair, chunk being even) cover a full ``chunk``, so consecutive
    chunk-end summaries tile a long run gaplessly back to its head.  A
    full-window scan over the Q/chunk summaries (same kernel, 1/chunk the
    rows) then yields, at the last wholly-covered chunk end before each
    tail, the max over everything the tail's capped window misses.
    Coverage never crosses a run head (in-kernel id compares), and extra
    same-run coverage is harmless for max, so:

        tail max = max(capped[tail], scanned_summary[tail//chunk - 1])

    with the correction dropped when that chunk end precedes the run
    (id mismatch) or the tail sits in chunk 0.
    """
    from . import seq_lattice as sl
    from . import pallas_scan as ps

    q, c = packed.shape
    hc = (head_count if head_count is not None
          else sl._blocked_cumsum(head.astype(jnp.int32)))
    qp = -(-q // chunk) * chunk
    if qp != q:
        pad = qp - q
        packed = jnp.concatenate(
            [packed, jnp.zeros((pad, c), packed.dtype)])
        hc = jnp.concatenate(
            [hc, hc[-1] + jnp.arange(1, pad + 1, dtype=jnp.int32)])
    capped = ps.sorted_segment_max_u32(hc, packed, interpret=interpret,
                                       max_window=chunk // 2)
    summ = capped[chunk - 1::chunk]
    summ_ids = hc[chunk - 1::chunk]
    scanned = ps.sorted_segment_max_u32(summ_ids, summ,
                                        interpret=interpret)
    base = capped[tails]
    e_chunk = tails // chunk - 1
    e_row = jnp.maximum(e_chunk, 0) * chunk + chunk - 1
    ok = (e_chunk >= 0) & (hc[e_row] == hc[tails])
    corr = jnp.where(ok[:, None], scanned[jnp.maximum(e_chunk, 0)],
                     jnp.zeros((), packed.dtype))
    return jnp.maximum(base, corr)


def _sorted_packed_max_impl(data, bary, live, head, bucket, tailpos,
                            bucket_live, head_count=None):
    packed = _pack_value_bary(data, bary, live)
    tails = tailpos.reshape(-1)
    if jax.default_backend() != "cpu" and packed.shape[1] <= 64:
        best = _seg_max_tails_twolevel(head, packed, tails,
                                       head_count=head_count)
    else:
        best = _seg_max_full_scan(head, packed)[tails]
    best = jnp.where(bucket_live.reshape(-1, 1), best, 0)
    return best, packed


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def sorted_packed_max(data, bary, live, head, bucket, tailpos, bucket_live,
                      head_count=None):
    """Packed value+bary segment max over CONTIGUOUS sorted sub-runs.

    The r3 batched-pointnet path: in the union's sorted order every
    (vertex, frame) bucket is a contiguous run, so the per-frame
    ``segment_max`` scatters (~8 ms/frame at bench scale) become ONE
    blocked segmented max-scan over all frames plus a (B,)-row gather at
    the recorded tail positions.  Same packed semantics as
    :func:`segment_max_with_bary_packed` (bf16-exact max, winner bary
    quantised to 1/65535, empty buckets -> (0, 0)).

    Args:
      data: (Q, C) rows in sorted order (cast to bf16 for packing).
      bary: (Q,) f32; live: (Q,) bool; head: (Q,) bool sub-run heads.
      bucket: (Q,) int32 bucket id per row (for the gradient gather).
      tailpos: (B,) or (T, cap) int32 sorted position of each bucket tail.
      bucket_live: matching bool, False for empty buckets (tailpos is 0
        there and would read an unrelated row).
      head_count: optional precomputed (Q,) int32 run ids (inclusive
        cumsum of head) -- the union already has them in table_tails mode.

    Returns (mx (B, C) f32, bary_sel (B, C) f32), B = tailpos.size.
    """
    best, _ = _sorted_packed_max_impl(data, bary, live, head, bucket,
                                      tailpos, bucket_live, head_count)
    return _decode_packed(best)


def _sorted_packed_max_fwd(data, bary, live, head, bucket, tailpos,
                           bucket_live, head_count=None):
    best, packed = _sorted_packed_max_impl(data, bary, live, head, bucket,
                                           tailpos, bucket_live, head_count)
    return _decode_packed(best), (packed, best, bucket,
                                  jnp.zeros((0,), data.dtype))


def _sorted_packed_max_bwd(res, cots):
    """Straight-through: each bucket/channel cotangent flows to the winning
    row by ONE gather of the bucket's best (see _packed_max_bwd)."""
    packed, best, bucket, dtype_token = res
    dmx, dbary_sel = cots
    nb = best.shape[0]
    best_pad = jnp.concatenate([best, jnp.zeros((1,) + best.shape[1:],
                                                best.dtype)])
    dmx_pad = jnp.concatenate([dmx, jnp.zeros((1,) + dmx.shape[1:],
                                              dmx.dtype)])
    dbs_pad = jnp.concatenate([dbary_sel,
                               jnp.zeros((1,) + dbary_sel.shape[1:],
                                         dbary_sel.dtype)])
    b = jnp.minimum(bucket, nb)
    sel_best = best_pad[b]
    winner = (packed == sel_best) & (sel_best != 0)
    ddata = jnp.where(winner, dmx_pad[b], 0.0).astype(dtype_token.dtype)
    dbary = jnp.where(winner, dbs_pad[b], 0.0).sum(-1)
    return ddata, dbary, None, None, None, None, None, None


sorted_packed_max.defvjp(_sorted_packed_max_fwd, _sorted_packed_max_bwd)
