"""Permutohedral lattice math: elevation, simplex finding, barycentric weights.

TPU-native replacement for the elevation/simplex-search stage of the CUDA
``DistributeLatticeModule`` used by the reference (called at
``/root/reference/seq_lattice/models.py:297-298``; the kernel itself lives in
the external ``lattice_net`` CUDA library).  Everything here is pure
``jax.numpy`` on static shapes so it fuses into one XLA program; there are no
data-dependent shapes and no host round-trips.

The math follows the classic permutohedral-lattice construction of
Adams, Baek & Davis, "Fast High-Dimensional Filtering Using the
Permutohedral Lattice" (EG 2010): points in R^d are embedded into the
hyperplane H_d = {x in R^(d+1) : sum(x) = 0}, which is tiled by uniform
simplices whose vertices form the A_d* lattice.  Each embedded point is
enclosed by exactly d+1 lattice vertices ("the simplex"), identified by a
rounding + rank-sort procedure, with barycentric weights that sum to 1.

Conventions used throughout this package:

* ``d``            -- input position dimensionality (3 for point clouds).
* ``elevated``     -- (N, d+1) float32 coordinates in the hyperplane.
* ``keys``         -- integer lattice coordinates.  Only the first ``d``
                      coordinates are stored (the last is redundant because a
                      lattice point's full (d+1)-vector sums to zero).
* remainder ``r``  -- each simplex vertex has all full coordinates congruent
                      to the same remainder r (mod d+1); vertex r of a
                      point's simplex carries barycentric weight ``bary[r]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "elevation_matrix",
    "scale_factors",
    "elevate",
    "find_enclosing_simplex",
    "neighbor_offsets",
]


@functools.lru_cache(maxsize=None)
def elevation_matrix(d: int) -> np.ndarray:
    """(d+1, d) matrix E with ``elevated = E @ (x * scale_factors)``.

    Row 0 is all ones; row i (i>=1) has -i at column i-1 and +1 at columns
    j >= i.  This reproduces the standard recurrence
    ``elevated[i] = sum_{j>=i} y_j - i * y_{i-1}`` in one matmul so the whole
    elevation for N points is a single (N,d)x(d,d+1) MXU-friendly contraction.
    """
    E = np.zeros((d + 1, d), dtype=np.float32)
    E[0, :] = 1.0
    for i in range(1, d + 1):
        E[i, i - 1] = -float(i)
        if i < d:
            E[i, i:] = 1.0
    return E


@functools.lru_cache(maxsize=None)
def scale_factors(d: int) -> np.ndarray:
    """Per-dimension scaling applied before elevation.

    ``s[j] = (d+1) * sqrt(2/3) / sqrt((j+1)(j+2))`` -- the standard deviation
    normalisation of the permutohedral embedding, matching the behaviour the
    reference inherits from the lattice_net CUDA kernels (sigma itself is a
    separate user knob, see `lnn_train_semantic_kitti.cfg:73`).
    """
    inv_std_dev = np.sqrt(2.0 / 3.0) * (d + 1)
    j = np.arange(d, dtype=np.float64)
    return (inv_std_dev / np.sqrt((j + 1) * (j + 2))).astype(np.float32)


def scale_positions(positions: jax.Array, sigma) -> jax.Array:
    """The pre-elevation scaling ``y = (positions / sigma) * scale_factors``.

    Factored out so the fused Pallas candidate kernel
    (ops/pallas_simplex.py) can compute it with the EXACT same jnp
    expression as :func:`elevate` -- a division by a constant is subject
    to context-dependent strength reduction, so doing it inside the kernel
    is not bit-stable against this path."""
    d = positions.shape[-1]
    s = jnp.asarray(scale_factors(d))
    return (positions / sigma).astype(jnp.float32) * s


def elevate(positions: jax.Array, sigma: jax.Array | float) -> jax.Array:
    """Embed (N, d) positions into the (N, d+1) hyperplane.

    ``sigma`` is the lattice scale (config ``lattice_gpu.sigma_0``); larger
    sigma => coarser lattice.  May be a scalar or a (d,) vector.
    """
    d = positions.shape[-1]
    y = scale_positions(positions, sigma)
    # Elementwise form, NOT a matmul: the result is rounded to integer
    # lattice keys so it needs full f32 precision, and a tiny-K
    # HIGHEST-precision dot lowers pathologically on TPU (measured 30 ms
    # for 524k points vs ~1 ms elementwise -- scripts/profile_union.py r2
    # bisection).  elevated[i] = sum_{j>=i} y_j - i * y_{i-1}.
    suffix = jnp.cumsum(y[..., ::-1], axis=-1)[..., ::-1]  # (N, d): sum_{j>=i} y_j
    cols = [suffix[..., 0]]
    for i in range(1, d + 1):
        tail = suffix[..., i] if i < d else 0.0
        cols.append(tail - float(i) * y[..., i - 1])
    return jnp.stack(cols, axis=-1)


def _rank_differential(diff: jax.Array) -> jax.Array:
    """Rank each coordinate's rounding residual, ties broken by index.

    rank[i] = #{j : diff[j] > diff[i]} + #{j < i : diff[j] == diff[i]},
    i.e. rank 0 is the largest residual.  Matches the classic pairwise loop
    (for i<j: rank[diff_i < diff_j ? i : j] += 1).
    """
    n = diff.shape[-1]
    a = diff[..., :, None]  # diff[i]
    b = diff[..., None, :]  # diff[j]
    idx = np.arange(n)
    j_lt_i = (idx[None, :] < idx[:, None])  # (i, j): j < i
    cmp = (b > a) | ((b == a) & j_lt_i)
    return jnp.sum(cmp, axis=-1).astype(jnp.int32)


def find_enclosing_simplex(elevated: jax.Array):
    """Locate the enclosing simplex of each elevated point.

    Args:
      elevated: (N, d+1) float32 points in the hyperplane (sum ~ 0).

    Returns:
      keys: (N, d+1, d) int32 -- for each point, the d+1 simplex-vertex keys
        (first d coordinates of each lattice point; vertex r is the
        remainder-r corner).
      bary: (N, d+1) float32 barycentric weights (sum to 1, vertex r order).
    """
    dp1 = elevated.shape[-1]
    d = dp1 - 1
    f_dp1 = jnp.float32(dp1)

    # Round each coordinate to the nearest multiple of (d+1).
    v = elevated / f_dp1
    up = jnp.ceil(v) * f_dp1
    down = jnp.floor(v) * f_dp1
    rem0 = jnp.where(up - elevated < elevated - down, up, down)
    rem0 = rem0.astype(jnp.int32)

    # How far the rounded point strays off the hyperplane, in units of (d+1).
    sum_s = jnp.sum(rem0, axis=-1)  # exact multiple of d+1
    if dp1 & (dp1 - 1) == 0:
        sum_g = sum_s >> int(dp1).bit_length() - 1  # exact-multiple shift
    else:
        sum_g = sum_s // dp1

    diff = elevated - rem0.astype(jnp.float32)
    rank = _rank_differential(diff)

    # Walk the rounded point back onto the hyperplane.
    rank = rank + sum_g[..., None]
    too_low = rank < 0
    too_high = rank > d
    rem0 = rem0 + jnp.where(too_low, dp1, 0) - jnp.where(too_high, dp1, 0)
    rank = rank + jnp.where(too_low, dp1, 0) - jnp.where(too_high, dp1, 0)

    # Barycentric coordinates from the ranked residuals.
    delta = (elevated - rem0.astype(jnp.float32)) / f_dp1  # (N, d+1)
    # bary[d - rank[i]] += delta[i];  bary[d + 1 - rank[i]] -= delta[i]
    # Computed as an elementwise masked reduce over the tiny (d+1, d+2)
    # axis pair: an einsum against one-hots lowers to 500k+ batched (1,4)x
    # (4,5) dot_generals, which is pathological MXU tiling (profiled at
    # tens of ms for 2M rows -- scripts/profile_union.py).
    k = np.arange(dp1 + 1, dtype=np.int32)                 # (d+2,)
    lo = (d - rank)[..., :, None] == k                     # (N, d+1, d+2)
    hi = (dp1 - rank)[..., :, None] == k
    bary_ext = jnp.sum(delta[..., :, None]
                       * (lo.astype(delta.dtype) - hi.astype(delta.dtype)),
                       axis=-2)                            # (N, d+2)
    bary = bary_ext[..., :dp1]
    bary = bary.at[..., 0].add(1.0 + bary_ext[..., dp1])

    # Simplex vertex keys: for remainder r, key[i] = rem0[i] + r, wrapped
    # down by (d+1) wherever rank[i] > d - r.  Only the first d coords kept.
    r = jnp.arange(dp1, dtype=jnp.int32)[:, None]          # (d+1, 1) remainders
    rem0_d = rem0[..., None, :d]                            # (N, 1, d)
    rank_d = rank[..., None, :d]                            # (N, 1, d)
    keys = rem0_d + r + jnp.where(rank_d > d - r, -dp1, 0)  # (N, d+1, d)

    return keys.astype(jnp.int32), bary.astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def neighbor_offsets(d: int) -> np.ndarray:
    """(2(d+1), d) int32 one-hop neighbor offsets in stored-key coordinates.

    A lattice vertex's one-hop neighbors differ by +/- o_a for a in 0..d,
    where the full (d+1)-dim offset o_a has +1 everywhere except -(d) at
    coordinate a.  Only the first d coordinates are stored.  Ordering is
    [+o_0..+o_d, -o_0..-o_d]; the model's im2row layout appends the center
    vertex as the LAST column to match the reference convention that "the
    last element is the center vertex"
    (`/root/reference/seq_lattice/lattice_modules.py:320,327`).
    """
    offs = []
    for a in range(d + 1):
        full = np.ones(d + 1, dtype=np.int32)
        full[a] = -d
        offs.append(full[:d])
    offs = np.stack(offs, axis=0)
    return np.concatenate([offs, -offs], axis=0)
