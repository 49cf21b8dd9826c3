"""Per-vertex building blocks: masked GroupNorm, 1x1 convs (linears), the
lattice ResNet/Bottleneck blocks and GN-ReLU-{Conv,Coarsen,Finefy} wrappers.

These re-create, natively for TPU, the ``latticenet_py.lattice.lattice_modules``
classes the reference imports (``Gn``, ``Conv1x1``, ``GnRelu1x1``,
``ResnetBlock``, ``BottleneckBlock``, ``GnReluCoarsen``, ``GnReluFinefy`` --
usage at /root/reference/seq_lattice/models.py:175-234 and
/root/reference/seq_lattice/lattice_modules.py:75-76).

All functions operate on capacity-padded (C_cap, C) vertex-value arrays with
a traced occupancy ``count`` and maintain the invariant that rows outside
[1, count) are exactly zero (see ``lattice_ops.mask_rows``).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import lattice_ops as lo
from ..ops.lattice_ops import NeighborTable


def gn_num_groups(channels: int) -> int:
    """Group count rule of latticenet's GroupNormLatticeModule: 32 groups,
    or channels/2 when channels <= 32; fall back to the largest divisor."""
    if channels <= 32:
        g = max(channels // 2, 1)
    else:
        g = 32
    while channels % g != 0:
        g -= 1
    return g


def torch_linear_init(fan_in: int):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return nn.initializers.uniform(scale=2 * bound, offset=-bound) if hasattr(
        nn.initializers, "uniform") else None


def _uniform(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def lattice_conv_kernel_init(fan_in: int):
    """Kaiming-uniform over the true fan-in with ReLU gain, matching the
    reference conv reset_parameters (lattice_modules.py:264-272; note the
    (in, out) weight layout makes torch's "fan_out" the true fan-in)."""
    bound = math.sqrt(6.0 / fan_in)
    return _uniform(bound)


class MaskedGroupNorm(nn.Module):
    """GroupNorm across the whole (valid) vertex set.

    The reference applies torch GroupNorm to the (1, C, V) value matrix, so
    statistics pool over all vertices of a group's channels; here the
    statistics are computed only over occupied rows so padding cannot skew
    them.  eps matches torch's 1e-5.
    """

    channels: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, count, mask=None) -> jax.Array:
        """``mask`` overrides the default [1, count) prefix validity -- used
        when rows are point-rows with scattered validity (attention_pool),
        so padding never enters the statistics."""
        cap, c = x.shape
        assert c == self.channels, (c, self.channels)
        groups = gn_num_groups(c)
        cpg = c // groups

        if mask is None:
            rows = jnp.arange(cap, dtype=jnp.int32)
            valid = (rows > 0) & (rows < count)
        else:
            valid = mask
        n = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)

        xg = x.reshape(cap, groups, cpg)
        denom = n * cpg
        mean = jnp.sum(xg * valid[:, None, None], axis=(0, 2)) / denom
        var = jnp.sum((xg - mean[None, :, None]) ** 2 * valid[:, None, None],
                      axis=(0, 2)) / denom
        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (xg - mean[None, :, None]) * inv[None, :, None]
        y = y.reshape(cap, c)

        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        y = y * scale + bias
        return jnp.where(valid[:, None], y, 0.0)


class Conv1x1(nn.Module):
    """Per-vertex linear map (the lattice '1x1 convolution')."""

    out_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, count, mask=None) -> jax.Array:
        c_in = x.shape[-1]
        bound = 1.0 / math.sqrt(c_in)
        kernel = self.param("kernel", _uniform(bound), (c_in, self.out_channels))
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", _uniform(bound), (self.out_channels,))
        if mask is not None:
            return jnp.where(mask[:, None], y, 0.0)
        return lo.mask_rows(y, count)


class LatticeConv(nn.Module):
    """One-hop lattice convolution over a NeighborTable (9 taps in 3D).

    ``dtype="bfloat16"`` casts values before the neighborhood gather (halving
    the gather traffic, the hot access pattern on TPU) and runs the MXU
    contraction in bf16 with f32 accumulation; parameters stay f32.
    """

    out_channels: int
    use_bias: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array, nbr: NeighborTable, count) -> jax.Array:
        c_in = x.shape[-1]
        k = nbr.idx.shape[1]
        kernel = self.param("kernel", lattice_conv_kernel_init(k * c_in),
                            (k * c_in, self.out_channels))
        bias = (self.param("bias", _uniform(1.0 / math.sqrt(k * c_in)),
                           (self.out_channels,)) if self.use_bias else None)
        cd = jnp.dtype(self.dtype)
        if cd != jnp.float32:
            rows = lo.gather_rowified(x.astype(cd), nbr)
            y = jnp.dot(rows, kernel.astype(cd),
                        preferred_element_type=jnp.float32)
            if bias is not None:
                y = y + bias
            return lo.mask_rows(y, count)
        return lo.lattice_conv(x, nbr, kernel, count, bias)


class GnRelu1x1(nn.Module):
    out_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, count, mask=None):
        x = MaskedGroupNorm(x.shape[-1], name="gn")(x, count, mask)
        x = jax.nn.relu(x)
        return Conv1x1(self.out_channels, self.use_bias,
                       name="conv")(x, count, mask)


class GnReluConv(nn.Module):
    out_channels: int
    use_bias: bool = False
    dropout: float = 0.0
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, nbr, count, deterministic=True):
        x = MaskedGroupNorm(x.shape[-1], name="gn")(x, count)
        x = jax.nn.relu(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return LatticeConv(self.out_channels, self.use_bias, self.dtype,
                           name="conv")(x, nbr, count)


class ResnetBlock(nn.Module):
    """Two pre-activation GN-ReLU-Conv layers with identity shortcut
    (latticenet ResnetBlock; models.py:175,227)."""

    channels: int
    biases: Sequence[bool] = (False, False)
    dropout: float = 0.0
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, nbr, count, deterministic=True):
        identity = x
        x = GnReluConv(self.channels, self.biases[0], self.dropout, self.dtype,
                       name="conv1")(x, nbr, count, deterministic)
        x = GnReluConv(self.channels, self.biases[1], dtype=self.dtype,
                       name="conv2")(x, nbr, count, deterministic)
        return lo.mask_rows(x + identity, count)


class BottleneckBlock(nn.Module):
    """1x1 reduce -> lattice conv -> 1x1 expand, with identity shortcut
    (latticenet BottleneckBlock; models.py:178,193,230).  Reduction factor 2."""

    channels: int
    biases: Sequence[bool] = (False, False, False)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, nbr, count, deterministic=True):
        identity = x
        mid = self.channels // 2
        x = GnRelu1x1(mid, self.biases[0], name="contract")(x, count)
        x = GnReluConv(mid, self.biases[1], dtype=self.dtype,
                       name="conv")(x, nbr, count, deterministic)
        x = GnRelu1x1(self.channels, self.biases[2], name="expand")(x, count)
        return lo.mask_rows(x + identity, count)


class GnReluCoarsen(nn.Module):
    """GN -> ReLU -> downsample onto the coarse lattice (models.py:182,353).

    TPU-native formulation: barycentric splat of fine features through the
    LevelLink followed by a learned one-hop conv at the coarse level.  The
    kernel shape (9*Cin, Cout) matches the reference coarsen conv, and the
    composition (fixed interpolation + learned 9-tap mix) spans the same
    family of downsampling filters.
    """

    out_channels: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, fine_values, fine_count, link, coarse_nbr,
                 coarse_count, deterministic=True):
        x = MaskedGroupNorm(fine_values.shape[-1], name="gn")(fine_values, fine_count)
        x = jax.nn.relu(x)
        coarse_cap = coarse_nbr.idx.shape[0]
        pooled = lo.splat_to_coarse(x, link, coarse_cap)
        pooled = lo.mask_rows(pooled, coarse_count)
        return LatticeConv(self.out_channels, use_bias=False, dtype=self.dtype,
                           name="conv")(pooled, coarse_nbr, coarse_count)


class GnReluFinefy(nn.Module):
    """GN -> ReLU -> transposed upsample onto a finer lattice
    (models.py:214,398): learned one-hop conv at the coarse level, then
    barycentric slice through the LevelLink back to the fine vertices."""

    out_channels: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, coarse_values, coarse_count, coarse_nbr, link,
                 fine_count, deterministic=True):
        x = MaskedGroupNorm(coarse_values.shape[-1], name="gn")(coarse_values, coarse_count)
        x = jax.nn.relu(x)
        x = LatticeConv(self.out_channels, use_bias=False, dtype=self.dtype,
                        name="conv")(x, coarse_nbr, coarse_count)
        y = lo.slice_to_fine(x, link)
        return lo.mask_rows(y, fine_count)


class DeformSlice(nn.Module):
    """Fused deform-slice + classifier, replacing
    ``SliceFastCUDALatticeModule`` (models.py:232,465).

    Per point: gather the d+1 simplex-vertex features, predict a delta to the
    barycentric weights from the concatenated simplex features (zero-init so
    training starts at the plain slice; disabled by the ``slice_no_deform``
    experiment -- models.py:39), blend, then classify linearly.
    """

    nr_classes: int
    dropout: float = 0.0
    deform: bool = True

    @nn.compact
    def __call__(self, values, point_vertex, point_bary, deterministic=True):
        p, dp1 = point_vertex.shape
        c = values.shape[-1]
        g = values[point_vertex]                       # (P, d+1, C)

        bary = point_bary
        if self.deform:
            feats = g.reshape(p, dp1 * c)
            dk = self.param("deform_kernel", nn.initializers.zeros,
                            (dp1 * c + dp1, dp1))
            db = self.param("deform_bias", nn.initializers.zeros, (dp1,))
            delta = jnp.dot(jnp.concatenate([feats, point_bary], -1), dk,
                            preferred_element_type=jnp.float32) + db
            # invalid simplex corners (bary 0, vertex 0) must stay at weight 0
            delta = jnp.where(point_bary != 0.0, delta, 0.0)
            bary = point_bary + delta

        sliced = jnp.einsum("pvc,pv->pc", g, bary)
        if self.dropout > 0.0:
            sliced = nn.Dropout(self.dropout, deterministic=deterministic)(sliced)

        bound = 1.0 / math.sqrt(c)
        kernel = self.param("classify_kernel", _uniform(bound), (c, self.nr_classes))
        bias = self.param("classify_bias", _uniform(bound), (self.nr_classes,))
        return jnp.dot(sliced, kernel, preferred_element_type=jnp.float32) + bias
