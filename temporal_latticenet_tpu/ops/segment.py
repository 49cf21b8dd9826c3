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

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments, valid=None):
    w = jnp.ones(data.shape[0], data.dtype) if valid is None else valid.astype(data.dtype)
    sums = jax.ops.segment_sum(data * w[:, None], segment_ids, num_segments=num_segments)
    cnts = jax.ops.segment_sum(w, segment_ids, num_segments=num_segments)
    return sums / jnp.maximum(cnts, 1.0)[:, None]


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
