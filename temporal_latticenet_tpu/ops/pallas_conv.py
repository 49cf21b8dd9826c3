"""Pallas fused gather+matmul for the one-hop lattice convolution.

XLA lowers the conv's neighborhood gather (``values[nbr_idx]``) to a generic
HBM gather that costs ~7 ns per gathered ROW regardless of row width
(measured: 6.2 ms for 885k rows, scripts/profile_r2.py) -- latency-bound,
~100x below HBM bandwidth.  This kernel keeps the whole vertex-value table
VMEM-resident (it fits for every conv the trimmed frames run at realistic
capacities: <= ~12 MB) and performs the row gathers from VMEM inside the
kernel, feeding the MXU contraction directly, so the HBM cost drops to one
stream of the table + the output.

Falls back to the XLA path (lattice_ops.lattice_conv) when the table would
not fit VMEM; callers use ``fits_vmem`` to decide.

Reference analog: ``ConvLatticeModule``'s im2row+matmul
(/root/reference/seq_lattice/lattice_modules.py:299-301,573).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the resident value table (of ~16 MB/core, leaving room
# for the index tile, scratch rows, weights and double buffering)
VMEM_VALUE_BUDGET = 12 * 1024 * 1024

TILE = 512  # vertices per grid step


def fits_vmem(capacity: int, cin: int, dtype=jnp.bfloat16) -> bool:
    return capacity * cin * jnp.dtype(dtype).itemsize <= VMEM_VALUE_BUDGET


def _conv_kernel(idx_ref, val_ref, w_ref, out_ref, rows_ref, *, k, cin):
    def gather_one(i, _):
        for j in range(k):
            r = idx_ref[i, j]
            rows_ref[i, j * cin:(j + 1) * cin] = val_ref[r, :]
        return 0

    jax.lax.fori_loop(0, TILE, gather_one, 0)
    out_ref[:] = jnp.dot(rows_ref[:], w_ref[:],
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lattice_conv_gather_matmul(values: jax.Array, nbr_idx: jax.Array,
                               weight: jax.Array, interpret: bool = False):
    """values (C, Cin) bf16 (zero outside the occupied range, per the
    mask_rows invariant); nbr_idx (C, K) int32 with absent neighbors
    pointing at row 0; weight (K*Cin, Cout).

    Returns (C, Cout) f32 = im2row(values)[nbr] @ weight (rows masked by the
    caller via mask_rows as usual).
    """
    c, cin = values.shape
    _, k = nbr_idx.shape
    cout = weight.shape[1]
    assert weight.shape[0] == k * cin
    assert c % TILE == 0, (c, TILE)

    grid = (c // TILE,)
    return pl.pallas_call(
        functools.partial(_conv_kernel, k=k, cin=cin),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full value table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weight
        ],
        out_specs=pl.BlockSpec((TILE, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, k * cin), values.dtype)],
        interpret=interpret,
    )(nbr_idx, values, weight.astype(values.dtype))
