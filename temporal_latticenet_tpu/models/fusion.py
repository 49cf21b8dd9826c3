"""Temporal fusion modules, re-created natively for TPU.

Each class mirrors one module of ``/root/reference/seq_lattice/lattice_modules.py``
(LSTMModule:17, GRUModule:42, CrossframeGlobalAttentionModule:70,
TemporalMaxPoolModule:119, TemporalLinearModule:149,
CrossframeLocalInterpolationModule:188 + CustomKernelConvLatticeIm2RowModule:238).

State handling is functional: the hidden value array ``h`` lives in the
sequence carry at full static capacity, and ``prev_count`` (the level's
vertex count when ``h`` was written) replaces the reference's dynamic
zero-padding (`pad_sequence` at lattice_modules.py:33,59,90,138 and `F.pad`
at :175,215) -- new vertices simply read the pad value.

Uniform call signature:
    new_lv, new_h = module(lv, h, prev_count, count, is_first, nbr)
where ``is_first`` is a traced bool: on the first frame of a sequence every
module is the identity and the hidden state is initialised to ``lv``
(first-frame contract, e.g. lattice_modules.py:29-30).

The torch cell equations (GRUCell/LSTMCell) are implemented explicitly with
torch's gate ordering and two bias vectors so a ``.pt`` checkpoint converts
weight-for-weight.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import lattice_ops as lo
from ..ops.lattice_ops import NeighborTable
from .blocks import Conv1x1, MaskedGroupNorm, _uniform


def _pad_hidden(h, prev_count, value):
    """Rows at/above prev_count read ``value`` (the reference's pad)."""
    rows = jnp.arange(h.shape[0], dtype=jnp.int32)
    return jnp.where((rows < prev_count)[:, None], h, value)


class TorchLinear(nn.Module):
    """Linear layer with torch's default init and (in, out) kernel layout."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param("kernel", _uniform(bound), (fan_in, self.features))
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", _uniform(bound), (self.features,))
        return y


class _GRUCell(nn.Module):
    """torch.nn.GRUCell equations, gate order [r, z, n], two bias vectors."""

    hidden: int

    @nn.compact
    def __call__(self, x, h):
        hd = self.hidden
        bound = 1.0 / math.sqrt(hd)
        w_ih = self.param("w_ih", _uniform(bound), (x.shape[-1], 3 * hd))
        w_hh = self.param("w_hh", _uniform(bound), (hd, 3 * hd))
        b_ih = self.param("b_ih", _uniform(bound), (3 * hd,))
        b_hh = self.param("b_hh", _uniform(bound), (3 * hd,))
        gi = jnp.dot(x, w_ih, preferred_element_type=jnp.float32) + b_ih
        gh = jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class _LSTMCell(nn.Module):
    """torch.nn.LSTMCell equations, gate order [i, f, g, o]."""

    hidden: int

    @nn.compact
    def __call__(self, x, h, c):
        hd = self.hidden
        bound = 1.0 / math.sqrt(hd)
        w_ih = self.param("w_ih", _uniform(bound), (x.shape[-1], 4 * hd))
        w_hh = self.param("w_hh", _uniform(bound), (hd, 4 * hd))
        b_ih = self.param("b_ih", _uniform(bound), (4 * hd,))
        b_hh = self.param("b_hh", _uniform(bound), (4 * hd,))
        g = (jnp.dot(x, w_ih, preferred_element_type=jnp.float32) + b_ih
             + jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh)
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        return jax.nn.sigmoid(o) * jnp.tanh(c_new), c_new


class GRUFusion(nn.Module):
    """GRUModule (lattice_modules.py:42-66): h <- Linear(h), zero-pad, then a
    per-vertex GRU cell; hidden <- output."""

    channels: int

    @nn.compact
    def __call__(self, lv, h, prev_count, count, is_first, nbr=None):
        hh = TorchLinear(self.channels, name="hidden_linear")(h)
        hh = _pad_hidden(hh, prev_count, 0.0)
        fused = _GRUCell(self.channels, name="gru")(lv, hh)
        out = jnp.where(is_first, lv, fused)
        out = lo.mask_rows(out, count)
        return out, out


class LSTMFusion(nn.Module):
    """LSTMModule (lattice_modules.py:17-40): the cell state is always fed
    zeros and the produced cell state is discarded (reference quirk)."""

    channels: int

    @nn.compact
    def __call__(self, lv, h, prev_count, count, is_first, nbr=None):
        hh = TorchLinear(self.channels, name="hidden_linear")(h)
        hh = _pad_hidden(hh, prev_count, 0.0)
        fused, _ = _LSTMCell(self.channels, name="lstm")(lv, hh, jnp.zeros_like(hh))
        out = jnp.where(is_first, lv, fused)
        out = lo.mask_rows(out, count)
        return out, out


class CGAFusion(nn.Module):
    """CrossframeGlobalAttentionModule (lattice_modules.py:70-116, from
    SpSequenceNet): the hidden state gates the current features.

    Reference quirks preserved: the SAME Conv1x1 weights are applied twice
    (:95,:102), and the "global average pool" is a multiplication by the
    scalar 1/(num_vertices + channels) (:104).  Gate rows for vertices that
    did not exist at t-1 are one-filled (:109-110)."""

    channels: int

    @nn.compact
    def __call__(self, lv, h, prev_count, count, is_first, nbr=None):
        conv = Conv1x1(self.channels, use_bias=False, name="conv")
        gn = MaskedGroupNorm(self.channels, name="groupnorm")

        hh = TorchLinear(self.channels, name="hidden_linear")(h)
        hh = _pad_hidden(hh, prev_count, 0.0)

        g = conv(hh, count)
        g = jax.nn.relu(g)
        g = gn(g, count)
        g = conv(g, count)
        g = g * (1.0 / (count.astype(jnp.float32) + self.channels))
        g = jax.nn.sigmoid(g)
        # one-fill gates of vertices new since t-1
        rows = jnp.arange(lv.shape[0], dtype=jnp.int32)
        g = jnp.where((rows >= prev_count)[:, None], 1.0, g)

        fused = g * lv
        out = jnp.where(is_first, lv, fused)
        out = lo.mask_rows(out, count)
        return out, out


class MaxPoolFusion(nn.Module):
    """TemporalMaxPoolModule (lattice_modules.py:119-145): elementwise max
    with the hidden state, padding new vertices with -9999."""

    channels: int = 0  # parameter-free; kept for a uniform constructor

    @nn.compact
    def __call__(self, lv, h, prev_count, count, is_first, nbr=None):
        hh = _pad_hidden(h, prev_count, -9999.0)
        fused = jnp.maximum(hh, lv)
        out = jnp.where(is_first, lv, fused)
        out = lo.mask_rows(out, count)
        return out, out


class LinearFusion(nn.Module):
    """TemporalLinearModule (lattice_modules.py:149-185):
    lv <- ReLU(Linear(cat[Linear(h) zero-padded, lv]))."""

    channels: int

    @nn.compact
    def __call__(self, lv, h, prev_count, count, is_first, nbr=None):
        hh = TorchLinear(self.channels, name="hidden_linear")(h)
        hh = _pad_hidden(hh, prev_count, 0.0)
        cat = jnp.concatenate([hh, lv], axis=-1)
        fused = jax.nn.relu(TorchLinear(self.channels, name="linear")(cat))
        out = jnp.where(is_first, lv, fused)
        out = lo.mask_rows(out, count)
        return out, out


class AFlowFusion(nn.Module):
    """CrossframeLocalInterpolationModule + CustomKernelConvLatticeIm2RowModule
    (lattice_modules.py:188-339) -- the paper's Abstract Flow module.

    Per vertex, feature-space distances between the current feature x^t and
    the 9 one-hop neighbor features of the previous frame's hidden state
    h^(t-1) are turned into weights w = (alpha - min(d, alpha)) * beta with
    row-normalised, gradient-detached distances; the output is the weighted
    average of the h^(t-1) neighborhood, concatenated with x^t through a
    Linear+ReLU.  New vertices read the -999999 pad (:215) so their weights
    collapse to zero exactly.

    Quirks preserved: the learned conv ``weight`` exists but is unused in the
    forward (:291 vs :331); the center tap is the LAST column (:320).
    """

    channels: int
    train_alpha_beta: bool = True
    use_center: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, lv, h, prev_count, count, is_first, nbr: NeighborTable = None):
        cap, c = lv.shape
        k = nbr.idx.shape[1]

        if self.train_alpha_beta:
            alpha = self.param("alpha", nn.initializers.constant(0.1), ())
            beta = self.param("beta", nn.initializers.constant(0.1), ())
        else:
            alpha, beta = jnp.float32(0.1), jnp.float32(0.1)
        # unused in forward, kept for checkpoint-schema parity (:291)
        self.param("weight", nn.initializers.zeros, (k * c, c))
        bias = (self.param("bias", _uniform(1.0 / math.sqrt(k * c)), (c,))
                if self.use_bias else None)

        h_pad = _pad_hidden(h, prev_count, -999999.0)
        # center-last: tap 9 is the row itself (no gather, cf. lattice_ops.
        # gather_rowified).  The 8 neighbor taps go through the symmetric
        # gather whose VJP is ANOTHER gather via the +/- tap pairing
        # (lattice_ops._gather8_sym) -- XLA's default VJP would scatter-add
        # cap*8 rows (~30 ns/row) into h every frame of the BPTT backward.
        # Row-0 / padding cotangent garbage is zeroed upstream by the
        # previous frame's mask_rows VJP, exactly as for the convs.
        if k == 9:
            nbr_g = lo._gather8_sym(h_pad, nbr.idx[:, :8])
        else:
            nbr_g = h_pad[nbr.idx[:, : k - 1]]
        h_nbr = jnp.concatenate(
            [nbr_g, h_pad[:, None, :]], axis=1)           # (cap, 9, C)
        found = nbr.found.astype(jnp.float32)        # (cap, 9)

        dist = jnp.sqrt(jnp.maximum(
            jnp.sum((h_nbr - lv[:, None, :]) ** 2, axis=-1), 1e-24))
        dist = dist * found
        if not self.use_center:
            dist = dist.at[:, -1].set(0.0)
        denom = jax.lax.stop_gradient(jnp.sum(dist, axis=1, keepdims=True))
        dist = dist / jnp.where(denom == 0.0, 1.0, denom)

        w = (alpha - jnp.minimum(dist, alpha)) * beta
        w = w * found
        if not self.use_center:
            w = w.at[:, -1].set(0.0)

        aflow = jnp.einsum("vkc,vk->vc", h_nbr * found[..., None], w)
        if bias is not None:
            aflow = aflow + bias

        cat = jnp.concatenate([aflow, lv], axis=-1)
        fused = jax.nn.relu(TorchLinear(self.channels, name="linear")(cat))
        out = jnp.where(is_first, lv, fused)
        out = lo.mask_rows(out, count)

        self.sow("aux", "aflow_weights", w)
        self.sow("aux", "aflow_neighbors", nbr.idx)
        return out, out


FUSION_CLASSES = {
    "gru": GRUFusion,
    "lstm": LSTMFusion,
    "cga": CGAFusion,
    "maxpool": MaxPoolFusion,
    "linear": LinearFusion,
    "aflow": AFlowFusion,
}


def make_fusion(kind: str, channels: int, cfg=None, name: str = None):
    """Instantiate a fusion module by its cfg name (``rnn_modules`` entries,
    models.py:51-54); returns None for "none"."""
    if kind == "none":
        return None
    if kind == "aflow":
        return AFlowFusion(
            channels,
            train_alpha_beta=(cfg.train_alpha_beta if cfg else True),
            use_center=(cfg.use_center if cfg else True),
            name=name)
    if kind == "maxpool":
        return MaxPoolFusion(name=name)
    return FUSION_CLASSES[kind](channels, name=name)
