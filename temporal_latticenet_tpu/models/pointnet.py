"""PointNet splat head: per-point-row MLP, segment-max reduction to vertices,
early temporal fusion and the first lattice convolution.

Mirrors ``PointNetSeqModule`` (/root/reference/seq_lattice/lattice_modules.py:343-576)
including its quirks:

* the barycentric column is dropped from the MLP input (:448-452) but the
  weights selected by the per-channel argmax of the scatter-max are
  concatenated back per vertex (:512-525);
* vertices touched by fewer than 4 point-rows are zeroed (:527-530), except
  when the early fusion is maxpool;
* for early maxpool fusion, vertex rows untouched by the current cloud are
  pre-filled with -9900 so the previous frame wins the max (:555-563);
* row 0 (the invalid bucket) is zeroed before the final conv (:569-570);
* ``experiment`` ablations: splat / attention_pool / pointnet_no_elevate*
  (:455-510; valid set models.py:39).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import lattice_ops as lo
from ..ops import segment as seg
from ..ops.lattice_ops import DistributeOut, NeighborTable
from .blocks import GnRelu1x1, LatticeConv, _uniform
from .fusion import make_fusion


def _kaiming_normal_fan_in(fan_in):
    std = math.sqrt(2.0 / fan_in)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std
    return init


class PointNetSeq(nn.Module):
    """See module docstring.  ``cfg.pointnet_layers`` e.g. (16, 32, 64)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, dist: DistributeOut, values_rows: jax.Array,
                 nbr: NeighborTable, count, h_early, prev_count, is_first,
                 deterministic=True, nr_points=None, sorted_batch=None,
                 pre_reduced=None):
        """Args:
          dist: DistributeOut of the current frame (level 0).
          values_rows: (R, V) per-row point feature values (reflectance etc.).
          nbr: level-0 neighbor table.
          count: level-0 vertex count.
          h_early / prev_count / is_first: early-fusion state.
          nr_points: optional (cap,) precomputed valid-row count per vertex
            for this frame (the whole-sequence lattice build emits it for
            free inside its union scans); when absent it is recomputed with
            a segment_sum like the reference's scatter (models.py:452-454).

        ``sorted_batch``: (SortedPN, values (T,P,V), row_bary (T,P*4),
        nr_points (T,cap)) -- batched fast path (r3): compute the MLP +
        packed max for ALL frames at once over the union-sorted rows and
        return the per-frame ``reduced`` tensor (T, cap, 2*C); no fusion,
        no conv (the caller replays frames with ``pre_reduced``).
        ``pre_reduced``: this frame's precomputed ``reduced`` -- skip the
        MLP+max and resume at the early fusion.

        Returns (lv (cap, start_nr_channels), new_h_early).
        """
        cfg = self.cfg
        if sorted_batch is not None:
            return self._reduce_sorted(*sorted_batch)
        experiment = cfg.experiment
        cap = nbr.idx.shape[0]
        if pre_reduced is not None:
            reduced = pre_reduced
            return self._fuse_and_conv(reduced, nbr, count, h_early,
                                       prev_count, is_first, deterministic)
        rid = dist.row_vertex
        rvalid = dist.row_valid

        x = jnp.concatenate([dist.row_rel_pos, values_rows], axis=-1)
        if experiment == "attention_pool":
            x = jnp.concatenate([x, dist.row_bary[:, None]], axis=-1)

        no_elevate = experiment in (
            "pointnet_no_elevate", "pointnet_no_elevate_no_local_mean", "splat")
        cd = jnp.dtype(cfg.compute_dtype)
        if not no_elevate:
            # the MLP runs over P*4 rows -- HBM-bound, so compute_dtype
            # (bf16) halves the traffic; weights stay f32 in params
            x = x.astype(cd)
            for i, width in enumerate(cfg.pointnet_layers):
                fan_in = x.shape[-1]
                k = self.param(f"layers_{i}_kernel", _kaiming_normal_fan_in(fan_in),
                               (fan_in, width))
                b = self.param(f"layers_{i}_bias", _uniform(1.0 / math.sqrt(fan_in)),
                               (width,))
                x = (jnp.dot(x, k.astype(cd),
                             preferred_element_type=jnp.float32)
                     + b).astype(cd)
                if i < len(cfg.pointnet_layers) - 1:
                    x = jax.nn.relu(x)
            # reductions stay in compute_dtype too (the scatter is the
            # expensive part); results return to f32 below

        if nr_points is None:
            counts = jax.ops.segment_sum(rvalid.astype(jnp.float32), rid,
                                         num_segments=cap)
        else:
            counts = nr_points

        if experiment == "splat":
            reduced = seg.segment_mean(x, rid, cap, rvalid)
            reduced = jnp.where((counts > 0)[:, None], reduced, 0.0)
        elif experiment == "attention_pool":
            mx, _ = seg.segment_max_with_argmax(x, rid, cap, rvalid)
            gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
            xm = x + gamma * mx[rid]
            fan_in = xm.shape[-1]
            pk = self.param("pre_conv_kernel", _kaiming_normal_fan_in(fan_in),
                            (fan_in, fan_in))
            pre = jnp.dot(xm, pk, preferred_element_type=jnp.float32)
            # the attention branch's GnRelu1x1s operate on point-rows in the
            # reference (lattice_modules.py:494-495, dynamic shapes = real
            # rows only); here rows are padded, so pass the validity mask to
            # keep padding out of the GroupNorm statistics
            act = GnRelu1x1(fan_in, False, name="att_activ")(
                pre, pre.shape[0], mask=rvalid)
            sc = GnRelu1x1(fan_in, True, name="att_scores")(
                act, act.shape[0], mask=rvalid)
            sc = jnp.exp(sc) * rvalid[:, None]
            ssum = jax.ops.segment_sum(sc, rid, num_segments=cap)
            sc = sc / jnp.maximum(ssum[rid], 1e-12)
            reduced = jax.ops.segment_sum(x * sc, rid, num_segments=cap)
            reduced = jnp.where((counts >= 4)[:, None], reduced, 0.0)
        else:
            if x.dtype == jnp.bfloat16:
                # one-pass packed max: value bits + winning bary ride the
                # same uint32 scatter (see segment_max_with_bary_packed)
                assert not cfg.reference_bary_quirk, (
                    "reference_bary_quirk needs the f32 argmax path "
                    "(compute_dtype='float32')")
                mx, bary_sel = seg.segment_max_with_bary_packed(
                    x, dist.row_bary, rid, cap, rvalid)
            else:
                mx, arg = seg.segment_max_with_argmax(x, rid, cap, rvalid)
                mx = mx.astype(jnp.float32)
                if cfg.reference_bary_quirk:
                    # faithful reproduction of lattice_modules.py:513-524:
                    # argmax entries whose absolute row index exceeds the
                    # vertex count n (or the empty sentinel) read bary[0]
                    argc = jnp.where((arg >= 0) & (arg <= count), arg, 0)
                    bary_sel = dist.row_bary[argc]
                else:
                    bary_sel = jnp.where(arg >= 0,
                                         dist.row_bary[jnp.maximum(arg, 0)],
                                         0.0)
            reduced = jnp.concatenate([mx, bary_sel], axis=-1)
            is_early_maxpool = (cfg.sequence_learning
                                and cfg.rnn_modules[0] == "maxpool")
            if not is_early_maxpool:
                reduced = jnp.where((counts >= 4)[:, None], reduced, 0.0)

        return self._fuse_and_conv(reduced, nbr, count, h_early,
                                   prev_count, is_first, deterministic)

    def _fuse_and_conv(self, reduced, nbr, count, h_early, prev_count,
                       is_first, deterministic):
        """Early temporal fusion + the first lattice conv (shared by the
        per-frame and pre-reduced paths)."""
        cfg = self.cfg
        new_h = h_early
        if cfg.sequence_learning and cfg.rnn_modules[0] != "none":
            fusion = make_fusion(cfg.rnn_modules[0], cfg.early_channels, cfg,
                                 name="fusion_module")
            if cfg.rnn_modules[0] == "maxpool":
                # pre-fill untouched rows so the previous frame wins the max
                half = reduced.shape[-1] // 2
                rowsum = jnp.sum(jnp.abs(reduced[:, :half]), axis=-1,
                                 keepdims=True)
                reduced = jnp.where(rowsum == 0.0, -9900.0, reduced)
            reduced, new_h = fusion(reduced, h_early, prev_count, count,
                                    is_first, nbr)

        reduced = lo.mask_rows(reduced, count)  # zero the invalid bucket

        lv = LatticeConv(cfg.pointnet_start_nr_channels, use_bias=False,
                         dtype=cfg.compute_dtype,
                         name="last_conv")(reduced, nbr, count)
        return lv, new_h

    def _reduce_sorted(self, spn, values, row_bary, nr_points_all):
        """All-frames MLP + packed max over union-sorted rows (r3).

        Identical per-row math to the frame path: the MLP is row-local, so
        order is irrelevant; the packed max over a (vertex, frame) bucket
        sees exactly the rows the per-frame segment_max saw.  The backward
        is the straight-through gather VJP (ops/segment.sorted_packed_max).
        """
        cfg = self.cfg
        cd = jnp.dtype(cfg.compute_dtype)
        t, p, v = values.shape
        if spn.vals is not None:
            # values + bary rode the union's sorts packed into uint32
            # operands (seq_lattice pn_values): bit-identical to the
            # gather below (vals bf16 = this concat's own cast; bary on
            # the 1/65535 grid = the packed max's own quantisation),
            # zero indexed rows
            vals_s = spn.vals * spn.live[:, None]
            bary_s = jnp.where(spn.live, spn.bary, 0.0)
        else:
            vals_flat = jnp.repeat(values.reshape(t * p, v), 4, axis=0)
            bary_flat = row_bary.reshape(-1)
            vb = jnp.concatenate([vals_flat, bary_flat[:, None]], 1)[spn.so]
            vals_s = vb[:, :v] * spn.live[:, None]
            bary_s = vb[:, v]

        x = jnp.concatenate([spn.rel, vals_s], axis=-1).astype(cd)
        for i, width in enumerate(cfg.pointnet_layers):
            fan_in = x.shape[-1]
            k = self.param(f"layers_{i}_kernel",
                           _kaiming_normal_fan_in(fan_in), (fan_in, width))
            b = self.param(f"layers_{i}_bias",
                           _uniform(1.0 / math.sqrt(fan_in)), (width,))
            x = (jnp.dot(x, k.astype(cd),
                         preferred_element_type=jnp.float32) + b).astype(cd)
            if i < len(cfg.pointnet_layers) - 1:
                x = jax.nn.relu(x)

        mx, bary_sel = seg.sorted_packed_max(
            x, bary_s, spn.live, spn.head_vf, spn.bucket,
            spn.tailpos, nr_points_all > 0,
            head_count=getattr(spn, "head_count", None))
        cap = nr_points_all.shape[1]
        c = x.shape[-1]
        reduced = jnp.concatenate([mx.reshape(t, cap, c),
                                   bary_sel.reshape(t, cap, c)], axis=-1)
        is_early_maxpool = (cfg.sequence_learning
                            and cfg.rnn_modules[0] == "maxpool")
        if not is_early_maxpool:
            reduced = jnp.where((nr_points_all >= 4)[..., None], reduced,
                                0.0)
        return reduced
