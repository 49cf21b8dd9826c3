"""Pallas TPU kernel: fused elevate + enclosing-simplex + key-pack.

The level-0 candidate stage (ops/permutohedral.elevate,
find_enclosing_simplex + vertex_table.pack_keys + the validity mask) is
pure elementwise math, but as separate XLA ops it materialises a dozen
(N, 4)-shaped intermediates plus the (N, 4, 3) int32 keys tensor in HBM
(~10.6 ms measured at bench scale for 524k points / 2M rows,
scripts/profile_union.py r3).  The keys tensor is never needed: for
simplex vertex r every coordinate is congruent to r (mod 4), so its
packed key is derived directly from the rounded remainder-0 point and
the coordinate ranks:

    m_j(r) = (rem0_j >> 2) - [rank_j > 3 - r] + BIAS
    packed(r) = m_0 << 22 | m_1 << 12 | m_2 << 2 | r

This kernel makes ONE pass: reads 3 coordinate planes + the point mask,
writes 4 packed-key planes + 4 barycentric planes, everything in VMEM,
no cross-tile state (embarrassingly parallel grid).

BIT-EXACTNESS: key rounding decisions must match the jnp reference path
exactly (the streaming per-frame path keeps using it, and
tests/test_seq_lattice.py asserts both paths assign identical indices).
The sigma/scale_factors step stays OUTSIDE the kernel in the shared
permutohedral.scale_positions expression (a division by a constant is
subject to context-dependent strength reduction); every op inside the
kernel is bit-stable (adds, multiplies by exact small constants,
ceil/floor, power-of-two divides, comparisons) and replicates the
reference's operation order.

Reference analog: the elevation/rank/bary stage of the CUDA distribute
kernel (called at /root/reference/seq_lattice/models.py:297-298; the
kernel lives in the external lattice_net library).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIAS = 512
_MMAX = 1021


def _simplex_kernel(x_ref, y_ref, z_ref, m_ref,
                    p0_ref, p1_ref, p2_ref, p3_ref,
                    b0_ref, b1_ref, b2_ref, b3_ref):
    """One (rows, 128) tile of points; all math unrolled over the 4
    hyperplane coordinates in registers.

    Inputs are the PRE-SCALED coordinates (permutohedral.scale_positions
    output): every op below is bit-stable across program contexts (adds,
    multiplies by exact powers of two / small integers, ceil/floor,
    comparisons), keeping the kernel exactly equal to the jnp path."""
    y0 = x_ref[:]
    y1 = y_ref[:]
    y2 = z_ref[:]

    # elevate: suffix sums in the reference's reversed-cumsum order
    t2 = y2
    t1 = y2 + y1
    t0 = t1 + y0
    e = [t0, t1 - 1.0 * y0, t2 - 2.0 * y1, 0.0 - 3.0 * y2]

    # round each coordinate to the nearest multiple of 4
    remf = []
    remi = []
    for i in range(4):
        v = e[i] / 4.0
        up = jnp.ceil(v) * 4.0
        down = jnp.floor(v) * 4.0
        rf = jnp.where(up - e[i] < e[i] - down, up, down)
        remf.append(rf)
        remi.append(rf.astype(jnp.int32))

    sum_g = (((remi[0] + remi[1]) + (remi[2] + remi[3]))) >> 2

    # rank of each rounding residual (ties by index), then hyperplane walk
    diff = [e[i] - remf[i] for i in range(4)]
    rank = []
    for i in range(4):
        r = None
        for j in range(4):
            if j == i:
                continue
            c = (diff[j] > diff[i]) if j > i else \
                (diff[j] > diff[i]) | (diff[j] == diff[i])
            ci = c.astype(jnp.int32)
            r = ci if r is None else r + ci
        rank.append(r + sum_g)
    for i in range(4):
        too_low = rank[i] < 0
        too_high = rank[i] > 3
        adj = jnp.where(too_low, 4, 0) - jnp.where(too_high, 4, 0)
        remi[i] = remi[i] + adj
        rank[i] = rank[i] + adj

    # barycentric weights from the ranked residuals (delta = (e - rem0)/4)
    delta = [(e[i] - remi[i].astype(jnp.float32)) / 4.0 for i in range(4)]

    def bary_ext(k):
        # pairwise-tree add order matches XLA's 4-element reduce, keeping
        # the result bit-identical to the jnp path
        t = []
        for i in range(4):
            lo = (rank[i] == 3 - k).astype(jnp.float32)
            hi = (rank[i] == 4 - k).astype(jnp.float32)
            t.append(delta[i] * (lo - hi))
        return (t[0] + t[1]) + (t[2] + t[3])

    b = [bary_ext(k) for k in range(5)]
    b[0] = b[0] + (1.0 + b[4])
    b0_ref[:] = b[0]
    b1_ref[:] = b[1]
    b2_ref[:] = b[2]
    b3_ref[:] = b[3]

    # packed keys per remainder r; rem0 coords are exact multiples of 4
    mask = m_ref[:] != 0
    mb = [(remi[j] >> 2) + _BIAS for j in range(3)]
    outs = [p0_ref, p1_ref, p2_ref, p3_ref]
    for r in range(4):
        a = [mb[j] - (rank[j] > 3 - r).astype(jnp.int32) for j in range(3)]
        ok = mask
        for j in range(3):
            ok &= (a[j] >= 0) & (a[j] <= _MMAX)
        packed = ((a[0] << 22) | (a[1] << 12)) | ((a[2] << 2) | r)
        outs[r][:] = jnp.where(ok, packed, -1)


def fused_simplex_pack(positions: jax.Array, mask: jax.Array, sigma,
                       rows: int = 256, interpret: bool = False):
    """Fused candidate stage for the whole-sequence lattice build.

    Args:
      positions: (N, 3) f32 points (all frames flattened).
      mask: (N,) bool point validity.
      sigma: static python float lattice scale.
    Returns:
      packed: (N, 4) uint32 -- vertex-r packed key per point
        (PACKED_SENTINEL where masked out / out of range); row-major
        flatten gives the union's candidate order (point-major, vertex
        minor), identical to
        ``pack_keys(where(mask, find_enclosing_simplex(elevate(...)),
        SENTINEL))``.
      bary: (N, 4) f32 barycentric weights (unmasked, like the reference).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = positions.shape[0]
    chunk = rows * 128
    if n % chunk != 0:
        pad = chunk - n % chunk
        positions = jnp.concatenate(
            [positions, jnp.zeros((pad, 3), positions.dtype)], axis=0)
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)], axis=0)
        packed, bary = fused_simplex_pack(positions, mask, sigma, rows,
                                          interpret)
        return packed[:n], bary[:n]

    from .permutohedral import scale_positions
    y = scale_positions(positions, sigma)      # same jnp expr as elevate
    nr = n // 128
    grid = nr // rows
    spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    x2 = y[:, 0].reshape(nr, 128)
    y2 = y[:, 1].reshape(nr, 128)
    z2 = y[:, 2].reshape(nr, 128)
    m2 = mask.astype(jnp.int32).reshape(nr, 128)
    outs = pl.pallas_call(
        _simplex_kernel,
        grid=(grid,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec] * 8,
        out_shape=[jax.ShapeDtypeStruct((nr, 128), jnp.int32)] * 4
        + [jax.ShapeDtypeStruct((nr, 128), jnp.float32)] * 4,
        interpret=interpret,
    )(x2, y2, z2, m2)
    packed = jnp.stack([o.reshape(n) for o in outs[:4]], axis=-1)
    bary = jnp.stack([o.reshape(n) for o in outs[4:]], axis=-1)
    return jax.lax.bitcast_convert_type(packed, jnp.uint32), bary
