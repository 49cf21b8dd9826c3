"""LNN_SEQ: the temporal permutohedral-lattice U-Net, TPU-native.

Re-creates the orchestration of ``/root/reference/seq_lattice/models.py``
(class LNN_SEQ, forward at :284-477) as a functional flax module over
static-capacity lattice state:

* per frame: distribute -> PointNet head (+early fusion) -> down path with
  middle fusion at level 0 -> bottleneck blocks + bottleneck fusion -> up
  path with late fusion at the finest level -> up resnets -> deform slice
  -> log-softmax;
* ``final=False`` reproduces ``early_return`` (models.py:307-430): the frame
  computes only up to the last non-"none" fusion point and returns the
  updated temporal state;
* the vertex tables and fusion hidden states live in ``SeqState`` and are
  carried across frames (the growing-hashmap invariant of models.py:286-289);
* quirk preserved: the up-stage resnet blocks sit OUTSIDE the upsample loop
  in the reference (models.py:435 at 12-space indent), so only the final
  stage's blocks ever run; ``cfg.apply_all_up_resnets`` restores the
  "intended" architecture.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..config import ModelConfig, RuntimeConfig
from ..ops import lattice_ops as lo
from ..ops import vertex_table as vt
from .blocks import (BottleneckBlock, DeformSlice, GnReluCoarsen, GnReluFinefy,
                     ResnetBlock)
from .fusion import make_fusion
from .pointnet import PointNetSeq

SITES = ("early", "middle", "bottleneck", "late")


def _sg(x, site: str):
    """PROFILING ONLY (scripts/profile_backward.py): stop_gradient at a
    named cut point when TLN_PROFILE_SG names it.  Severing the backward at
    successive depths attributes BPTT cost per network segment (the
    backward analog of the early-return netsplit cuts).  Off (identity)
    unless the env var is set; never set in production paths."""
    import os
    if os.environ.get("TLN_PROFILE_SG", "") == site:
        return jax.lax.stop_gradient(x)
    return x


@flax.struct.dataclass
class SeqState:
    """Temporal carry, replacing the reference's stateful module attributes
    (h_lv per fusion module + the CUDA hashtable)."""

    tables: Tuple[vt.VertexTable, ...]   # vertex tables, levels 0..nr_downsamples
    h: Tuple[jax.Array, ...]             # hidden values per site (early, middle, bottleneck, late)
    prev_counts: Tuple[jax.Array, ...]   # site level's vertex count when h was written
    t: jax.Array                         # frame index within the sequence


def site_level(cfg: ModelConfig, site: str) -> int:
    return cfg.nr_downsamples if site == "bottleneck" else 0


def site_channels(cfg: ModelConfig, site: str) -> int:
    return {
        "early": cfg.early_channels,
        "middle": cfg.middle_channels,
        "bottleneck": cfg.bottleneck_channels,
        "late": cfg.late_channels,
    }[site]


def init_state(cfg: ModelConfig, rt: RuntimeConfig) -> SeqState:
    """Fresh sequence state; the analog of ``model.reset_sequence()`` +
    ``Lattice.create`` (train_ln.py:236-239)."""
    caps = rt.capacities(cfg.nr_downsamples)
    tables = tuple(vt.make_table(c, 3) for c in caps)
    h, pc = [], []
    for site, kind in zip(SITES, cfg.rnn_modules):
        if cfg.sequence_learning and kind != "none":
            cap = caps[site_level(cfg, site)]
            h.append(jnp.zeros((cap, site_channels(cfg, site)), jnp.float32))
        else:
            h.append(jnp.zeros((1, 1), jnp.float32))
        pc.append(jnp.int32(1))
    return SeqState(tables=tables, h=tuple(h), prev_counts=tuple(pc),
                    t=jnp.int32(0))


def _last_active_site(cfg: ModelConfig) -> int:
    """Index of the last non-"none" fusion site (early_return cut point)."""
    last = -1
    for i, kind in enumerate(cfg.rnn_modules):
        if kind != "none":
            last = i
    return last


class LNNSeq(nn.Module):
    """One frame of the temporal forward.  Call with ``final=False`` for
    non-final frames (early_return) and ``final=True`` for the last frame,
    which additionally runs the up-resnets + slice and returns logits."""

    cfg: ModelConfig
    rt: RuntimeConfig

    @nn.compact
    def __call__(self, positions, values, mask, state: SeqState,
                 final: bool = True, deterministic: bool = True, pre=None,
                 pointnet_batch=None, pre_reduced=None):
        """``pre``, when given, is (SeqLattice, DistributeOut-for-this-frame)
        from ``ops.seq_lattice.build_sequence_lattice``: the whole sequence's
        tables/neighbors/links were built in one pass and this frame only
        runs the network (see seq_lattice.py)."""
        cfg, rt = self.cfg, self.rt
        if pointnet_batch is not None:
            # r3 batched-pointnet precompute: values is the full (T, P, V)
            # stack; returns (T, cap0, 2C) pre-reduced tensors (see
            # PointNetSeq._reduce_sorted)
            return PointNetSeq(cfg, name="point_net_seq")(
                None, None, None, None, None, None, None,
                sorted_batch=(pointnet_batch.sorted_pn, values,
                              pointnet_batch.row_bary,
                              pointnet_batch.nr_points))
        L = cfg.nr_downsamples
        is_first = state.t == 0
        seq = cfg.sequence_learning
        cut = _last_active_site(cfg) if seq else 3

        h = list(state.h)
        pc = list(state.prev_counts)
        tables = list(state.tables)

        def pack_state():
            return SeqState(tables=tuple(tables), h=tuple(h),
                            prev_counts=tuple(pc), t=state.t + 1)

        fusions = []
        for i, site in enumerate(SITES[1:], start=1):  # middle/bottleneck/late
            kind = cfg.rnn_modules[i] if seq else "none"
            fusions.append(make_fusion(kind, site_channels(cfg, site), cfg,
                                       name=f"recurrent_fusion_modules_{i-1}")
                           if kind != "none" else None)

        # ---- lattice structure for this frame -----------------------------
        # named scopes mirror the reference's TIME_START labels
        # (models.py:302,313,389) for jax.profiler traces
        with jax.named_scope("distribute"):
            if pre is not None:
                seqlat, dist = pre
                if isinstance(seqlat, lo.FrameStructures):
                    # streaming fast path: structures updated incrementally
                    # by the engine between frames
                    nbrs = list(seqlat.nbrs)
                    links = list(seqlat.links)
                    counts = list(seqlat.counts)
                    nr_points = None
                else:
                    t = state.t
                    nbrs = [seqlat.frame_nbr(l, t) for l in range(L + 1)]
                    links = list(seqlat.links)
                    counts = [seqlat.levels[l].counts[t]
                              for l in range(L + 1)]
                    nr_points = (None if seqlat.nr_points is None
                                 else seqlat.nr_points[t])
            else:
                subtract_mean = cfg.experiment not in (
                    "pointnet_no_local_mean",
                    "pointnet_no_elevate_no_local_mean")
                tables[0], dist = lo.distribute(
                    tables[0], positions, mask, rt.sigma,
                    subtract_local_mean=subtract_mean)
                nr_points = None
                nbrs = [lo.build_neighbor_table(tables[0])]
                links = []
                counts = [tables[0].count]
                for i in range(L):
                    tables[i + 1], link = lo.grow_coarse_table(
                        tables[i], tables[i + 1])
                    links.append(link)
                    nbrs.append(lo.build_neighbor_table(tables[i + 1]))
                    counts.append(tables[i + 1].count)
        values_rows = jnp.repeat(values, 4, axis=0) * dist.row_valid[:, None]

        with jax.named_scope("pointnet"):
            lv, h[0] = PointNetSeq(cfg, name="point_net_seq")(
                dist, values_rows, nbrs[0], counts[0], h[0], pc[0],
                is_first, deterministic, nr_points=nr_points,
                pre_reduced=pre_reduced)
        lv = _sg(lv, "pn")
        pc[0] = counts[0]

        if (not final) and seq and cut <= 0:
            return None, pack_state(), {"point_vertex": dist.point_vertex}

        # ---- down path ---------------------------------------------------
        skip_values, skip_counts = [], []
        cur = cfg.pointnet_start_nr_channels
        for i in range(L):
            for j in range(cfg.nr_blocks_down_stage[i]):
                if i < cfg.nr_levels_down_with_normal_resnet:
                    lv = ResnetBlock(cur, (False, False), dtype=cfg.compute_dtype,
                                     name=f"resnet_blocks_per_down_lvl_list_{i}_{j}")(
                                         lv, nbrs[i], counts[i], deterministic)
                else:
                    lv = BottleneckBlock(cur, (False, False, False), dtype=cfg.compute_dtype,
                                         name=f"resnet_blocks_per_down_lvl_list_{i}_{j}")(
                                             lv, nbrs[i], counts[i], deterministic)
            skip_values.append(lv)
            skip_counts.append(counts[i])

            if i == 0:
                if fusions[0] is not None:
                    lv, h[1] = fusions[0](lv, h[1], pc[1], counts[0], is_first,
                                          nbrs[0])
                    pc[1] = counts[0]
                if (not final) and seq and cut <= 1:
                    return None, pack_state(), {"point_vertex": dist.point_vertex}

            # coarsen onto level i+1 (table/link built in the setup phase)
            cur = int(cur * 2 * cfg.compression_factor)
            lv = GnReluCoarsen(cur, dtype=cfg.compute_dtype,
                               name=f"coarsens_list_{i}")(
                lv, counts[i], links[i], nbrs[i + 1], counts[i + 1],
                deterministic)

        # ---- bottleneck --------------------------------------------------
        for j in range(cfg.nr_blocks_bottleneck):
            lv = BottleneckBlock(cur, (False, False, False), dtype=cfg.compute_dtype,
                                 name=f"resnet_blocks_bottleneck_{j}")(
                                     lv, nbrs[L], counts[L], deterministic)

        if fusions[1] is not None:
            lv, h[2] = fusions[1](lv, h[2], pc[2], counts[L], is_first, nbrs[L])
            pc[2] = counts[L]
        lv = _sg(lv, "upcut")
        if (not final) and seq and cut <= 2:
            return None, pack_state(), {"point_vertex": dist.point_vertex}

        # ---- up path -----------------------------------------------------
        aux = {}
        for i in range(L):
            lvl = L - 1 - i  # target (finer) level
            fine_v = _sg(skip_values.pop(), "upcut")
            fine_c = skip_counts.pop()
            nf = cur // 2
            up = GnReluFinefy(nf, dtype=cfg.compute_dtype,
                              name=f"finefy_list_{i}")(
                lv, counts[lvl + 1], nbrs[lvl + 1], links[lvl],
                counts[lvl], deterministic)
            lv = jnp.concatenate([up, fine_v], axis=-1)
            cur = nf + fine_v.shape[-1]

            if i == L - 1:
                if fusions[2] is not None:
                    lv, h[3] = fusions[2](lv, h[3], pc[3], counts[0], is_first,
                                          nbrs[0])
                    pc[3] = counts[0]
                lv = _sg(lv, "late")
                if not final and seq:
                    return None, pack_state(), {"point_vertex": dist.point_vertex}

            if cfg.apply_all_up_resnets and i < L - 1:
                for j in range(cfg.nr_blocks_up_stage[i]):
                    lv = ResnetBlock(cur, (False, False), dtype=cfg.compute_dtype,
                                     name=f"resnet_blocks_per_up_lvl_list_{i}_{j}")(
                                         lv, nbrs[lvl], counts[lvl], deterministic)

        # Reference quirk (models.py:435): only the final stage's up resnets
        # run; the loop variable i has leaked as nr_downsamples-1.
        i = L - 1
        for j in range(cfg.nr_blocks_up_stage[i]):
            is_last_conv = j == cfg.nr_blocks_up_stage[i] - 1
            if i >= L - cfg.nr_levels_up_with_normal_resnet:
                lv = ResnetBlock(cur, (False, is_last_conv), dtype=cfg.compute_dtype,
                                 name=f"resnet_blocks_per_up_lvl_list_{i}_{j}")(
                                     lv, nbrs[0], counts[0], deterministic)
            else:
                lv = BottleneckBlock(cur, (False, False, is_last_conv), dtype=cfg.compute_dtype,
                                     name=f"resnet_blocks_per_up_lvl_list_{i}_{j}")(
                                         lv, nbrs[0], counts[0], deterministic)

        # ---- slice + classify -------------------------------------------
        lv = _sg(lv, "slice_in")
        sv = DeformSlice(cfg.nr_classes, cfg.dropout_last_layer,
                         deform=(cfg.experiment != "slice_no_deform"),
                         name="slice_fast_cuda")(
                             lv, dist.point_vertex, dist.point_bary,
                             deterministic)
        logp = jax.nn.log_softmax(_sg(sv, "logits"), axis=-1)
        aux["nr_vertices"] = counts[0]
        aux["occupancy"] = jnp.stack([counts[l] for l in range(L + 1)])
        # saturation flag: count == capacity means the table is FULL -- zero
        # headroom, and any further unique vertices were dropped to the
        # row-0 bucket (the "-1 on failed insert" contract).  An exactly-
        # full table with no drops also fires; either way the capacity must
        # be raised.  Surfaced in train metrics so this is never silent
        # (r1 shipped a bench that saturated level 0 unnoticed).
        caps = rt.capacities(L)
        aux["vertex_overflow"] = jnp.any(jnp.stack(
            [counts[l] >= caps[l] for l in range(L + 1)]))
        aux["point_vertex"] = dist.point_vertex
        return (logp, sv), pack_state(), aux
