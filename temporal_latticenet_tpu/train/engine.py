"""Jit-compiled training/eval engine.

The reference's per-frame Python loop with CUDA sync points
(/root/reference/train_ln.py:160-239) becomes two XLA programs:

* ``sequence_forward``: ``lax.scan`` over the first T-1 frames with the
  trimmed (early_return) model body, then the full model on the final frame
  -- one fused device program per sequence, BPTT through the scan carry;
* ``train_step``: value_and_grad of the sequence loss (0.5 Lovasz + 0.5 NLL
  on the last frame only, train_ln.py:212-216) + AdamW(amsgrad) update.

Batch axis: everything is vmapped over a leading batch dimension of
sequences and sharded over the ``dp`` mesh axis (each device owns whole
sequences; gradients all-reduce over ICI).  The reference has no
parallelism at all (SURVEY.md 2.7) -- this layer is the TPU-native scaling
story on top of capability parity.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig, RuntimeConfig
from ..models import LNNSeq, init_state
from ..models.losses import segmentation_loss
from . import optim


class SeqBatch(NamedTuple):
    """A batch of padded sequences, shapes (B, T, P, ...)."""

    positions: jax.Array
    values: jax.Array
    labels: jax.Array
    mask: jax.Array

    @staticmethod
    def stack(frame_lists) -> "SeqBatch":
        """frame_lists: list over batch of lists over time of FrameBatch."""
        def take(attr):
            return jnp.asarray(np.stack(
                [np.stack([getattr(f, attr) for f in seq]) for seq in frame_lists]))
        return SeqBatch(take("positions"), take("values"),
                        take("labels"), take("mask"))


def make_sequence_forward(model: LNNSeq, cfg: ModelConfig, rt: RuntimeConfig,
                          precompute: bool = True, remat=False):
    """Single-sequence forward: (params, frames(T,P,...)) -> (logp, aux).

    With ``precompute=True`` (default) the whole sequence's lattice is built
    in one birth-tagged pass (ops/seq_lattice.py) and the per-frame scan
    only runs the network -- ~50% of sequence time in the streaming path was
    repeated table construction.  ``precompute=False`` keeps the streaming
    per-frame path (exactly what online inference uses).

    ``remat`` controls BPTT rematerialisation of each frame's network:
      False        -- save every activation (overflows HBM at full scale);
      True/"full"  -- recompute the whole frame in the backward (max
                     memory saving, ~+1x forward FLOPs + scatters);
      "selective"  -- save everything EXCEPT the (C, 9*Cin) rowified conv
                     neighborhoods (the largest activations, 9x their
                     source rows; named in ops/lattice_ops.gather_rowified)
                     -- the backward redoes only cheap gathers."""

    from ..ops import lattice_ops as lo
    from ..ops import seq_lattice as sl

    subtract_mean = cfg.experiment not in (
        "pointnet_no_local_mean", "pointnet_no_elevate_no_local_mean")
    caps = rt.capacities(cfg.nr_downsamples)

    def _maybe_remat(fn):
        if not remat or remat == "none":
            return fn
        if remat == "selective":
            policy = jax.checkpoint_policies.save_anything_except_these_names(
                "lattice_conv_rows")
            return jax.checkpoint(fn, policy=policy)
        return jax.checkpoint(fn)

    def seq_forward(params, positions, values, mask, deterministic=True,
                    rng=None):
        # dropout (cfg.dropout_last_layer) only exists in the final-frame
        # DeformSlice head (models.py:232 in the reference), so the rng is
        # threaded to the final apply only; trimmed frames have no dropout.
        rngs = (None if deterministic or rng is None
                else {"dropout": rng})
        state = init_state(cfg, rt)
        t = positions.shape[0]

        if precompute:
            # r3 trimmed-frame capacities: frames 0..T-2 run the network on
            # [0, trim_cap) row prefixes (birth-sorted indices make the
            # prefix complete for those frames -- sl.trim_sequence_lattice).
            trim_caps = rt.trim_capacities(cfg.nr_downsamples)
            do_trim = trim_caps is not None and t > 1 and any(
                tc < c for tc, c in zip(trim_caps, caps))
            # r3: FINAL-frame trim -- the full capacity only sizes the union
            # build's overflow headroom; the last frame's network runs on
            # [0, final_cap) prefixes (complete because indices are
            # birth-sorted and final_cap >= counts[T-1], checked below)
            ftrim_caps = rt.final_capacities(cfg.nr_downsamples)
            do_ftrim = ftrim_caps is not None and any(
                fc < c for fc, c in zip(ftrim_caps, caps))
            # when EVERY model apply consumes a trimmed view, the neighbor
            # tables only ever need the max(trim, final) row prefix --
            # fewer build-stage lookup queries and a smaller inverse scatter
            all_trimmed = do_ftrim and (do_trim or t == 1)
            nbr_caps = (tuple(max(tc, fc) for tc, fc in
                              zip(trim_caps, ftrim_caps))
                        if all_trimmed and do_trim else
                        (ftrim_caps if all_trimmed else None))
            # feed values into the build when the batched pointnet will
            # consume them: they ride the union sorts (ONE packed uint32
            # operand for 1-ch reflectance) instead of a (Q, v+1)-row
            # gather afterwards.  Any batched pointnet reads the SORTED
            # rel, so the build can also drop the unsort's rel operands.
            batch_pn_pre = (subtract_mean
                            and getattr(rt, "batched_pointnet", False)
                            and cfg.experiment == "none"
                            and cfg.compute_dtype == "bfloat16")
            will_batch_pn = batch_pn_pre and values.shape[-1] <= 3
            seqlat = sl.build_sequence_lattice(
                positions, mask, rt.sigma, caps, cfg.nr_downsamples,
                subtract_local_mean=subtract_mean, nbr_caps=nbr_caps,
                pn_values=values if will_batch_pn else None,
                want_row_rel=not batch_pn_pre)
            # undersized trim caps exclude late-born vertices from the
            # trimmed frames' compute: surface it exactly like a saturated
            # vertex table, never silently
            trim_overflow = (jnp.any(jnp.stack(
                [seqlat.levels[l].counts[-2] > trim_caps[l]
                 for l in range(cfg.nr_downsamples + 1)]))
                if do_trim else jnp.asarray(False))
            if do_ftrim:
                trim_overflow = trim_overflow | jnp.any(jnp.stack(
                    [seqlat.levels[l].counts[-1] > ftrim_caps[l]
                     for l in range(cfg.nr_downsamples + 1)]))

            full_dist = lo.DistributeOut(
                row_vertex=seqlat.row_vertex, row_bary=seqlat.row_bary,
                row_rel_pos=seqlat.row_rel_pos, row_valid=seqlat.row_valid,
                point_vertex=seqlat.point_vertex,
                point_bary=seqlat.point_bary)  # all fields (T, ...)

            # r3 batched pointnet: the MLP + packed max have no temporal
            # dependency, so compute them for ALL frames at once over the
            # union-sorted rows (one blocked max-scan instead of T
            # segment_max scatters); each frame then resumes at its early
            # fusion with its pre-reduced slice.
            batched_pn = (seqlat.sorted_pn is not None
                          and getattr(rt, "batched_pointnet", False)
                          and cfg.experiment == "none"
                          and cfg.compute_dtype == "bfloat16")
            if batched_pn:
                reduced_all = model.apply(
                    params, None, values, None, state,
                    pointnet_batch=seqlat)
            else:
                reduced_all = jnp.zeros((t, 1, 1), jnp.float32)

            def _red(slice_):
                return slice_ if batched_pn else None

            def _site_caps(which):
                from ..models.lnn_seq import SITES, site_level
                return [which[site_level(cfg, s)] for s in SITES]

            def _resize_rows(a, c):
                """Slice or zero-pad the row axis to c; exact either way
                because fusion outputs are mask_rows-clean (rows past the
                frame's count are exactly zero)."""
                if a.shape[0] >= c:
                    return a[:c]
                return jnp.pad(a, ((0, c - a.shape[0]), (0, 0)))

            if t > 1:
                scan_lat = (sl.trim_sequence_lattice(seqlat, trim_caps)
                            if do_trim else seqlat)
                red_scan = (reduced_all[:-1, : trim_caps[0]]
                            if (do_trim and batched_pn)
                            else reduced_all[:-1])

                if do_trim:
                    # slice the carried fusion states to the trimmed caps;
                    # fusion outputs are mask_rows-clean, so the rows this
                    # drops (unborn during trimmed frames) are exactly zero
                    # and the post-scan zero-pad restores them bit-equal
                    h_t = _site_caps(trim_caps)
                    state = state.replace(h=tuple(
                        (a[:c] if a.shape[0] > 1 else a)
                        for a, c in zip(state.h, h_t)))

                @_maybe_remat
                def step_trim(carry, v, m, d, red):
                    _, carry, _ = model.apply(
                        params, None, v, m, carry, final=False,
                        deterministic=deterministic, pre=(scan_lat, d),
                        pre_reduced=_red(red))
                    return carry

                def body(carry, xs):
                    v, m, d, red = xs
                    return step_trim(carry, v, m, d, red), ()
                xs = (values[:-1], mask[:-1],
                      jax.tree_util.tree_map(lambda a: a[:-1], full_dist),
                      red_scan)
                state, _ = jax.lax.scan(body, state, xs)
                import os
                if os.environ.get("TLN_PROFILE_SG_CARRY") == "1":
                    # PROFILING ONLY (scripts/profile_backward.py): sever
                    # the BPTT backward at the scan boundary -- the trimmed
                    # frames' backward is DCE'd, isolating the final
                    # frame's backward cost
                    state = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                                   state)
            # resize the carried fusion states to the final frame's row
            # space (ftrim caps when final-frame trimming is on, else full)
            if do_trim or do_ftrim:
                h_target = _site_caps(ftrim_caps if do_ftrim else caps)
                state = state.replace(h=tuple(
                    (_resize_rows(a, c) if a.shape[0] > 1 else a)
                    for a, c in zip(state.h, h_target)))
            last_dist = jax.tree_util.tree_map(lambda a: a[-1], full_dist)
            if do_ftrim:
                final_lat = sl.trim_sequence_lattice(seqlat, ftrim_caps)
                red_final = (reduced_all[-1, : ftrim_caps[0]] if batched_pn
                             else reduced_all[-1])
            else:
                final_lat, red_final = seqlat, reduced_all[-1]

            @_maybe_remat
            def step_final(carry, v, m, d, red):
                (logp, sv), carry, aux = model.apply(
                    params, None, v, m, carry, final=True,
                    deterministic=deterministic, pre=(final_lat, d),
                    pre_reduced=_red(red), rngs=rngs)
                return logp, sv, carry, aux

            logp, sv, state, aux = step_final(state, values[-1], mask[-1],
                                              last_dist, red_final)
            aux["trim_overflow"] = trim_overflow
            aux["vertex_overflow"] = aux["vertex_overflow"] | trim_overflow
            return logp, sv, aux

        if t > 1:
            @_maybe_remat
            def step_stream(carry, p, v, m):
                _, carry, _ = model.apply(params, p, v, m, carry, final=False,
                                          deterministic=deterministic)
                return carry

            def body(carry, inp):
                p, v, m = inp
                return step_stream(carry, p, v, m), ()
            state, _ = jax.lax.scan(
                body, state, (positions[:-1], values[:-1], mask[:-1]))
        (logp, sv), state, aux = model.apply(
            params, positions[-1], values[-1], mask[-1], state, final=True,
            deterministic=deterministic, rngs=rngs)
        return logp, sv, aux

    return seq_forward


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def create_train_state(cfg: ModelConfig, rt: RuntimeConfig, lr: float,
                       weight_decay: float, seed: int = 0):
    """Initialise model params (one tiny forward; the analog of the
    reference's lazy-parameter first forward, train_ln.py:178) and the
    optimiser."""
    model = LNNSeq(cfg, rt)
    k = jax.random.PRNGKey(seed)
    p = jnp.zeros((8, 3), jnp.float32)
    v_dim = 1
    v = jnp.zeros((8, v_dim), jnp.float32)
    m = jnp.ones((8,), bool)
    # init with a tiny runtime so initialisation is instant; shapes of
    # params do not depend on capacities
    tiny_rt = RuntimeConfig(max_points=8, capacity_level0=64,
                            capacity_decay=1.0, min_capacity=64,
                            sigma=rt.sigma)
    tiny_model = LNNSeq(cfg, tiny_rt)
    # jit the init: eager flax init dispatches thousands of tiny ops, which
    # is pathological over a remote-TPU tunnel
    init_fn = jax.jit(lambda k_, p_, v_, m_, s_: tiny_model.init(
        k_, p_, v_, m_, s_, final=True))
    variables = init_fn(k, p, v, m, init_state(cfg, tiny_rt))
    params = {"params": variables["params"]}
    tx = optim.make_optimizer(lr, weight_decay)
    opt_state = tx.init(params["params"])
    return model, TrainState(params, opt_state, jnp.int32(0)), tx


def make_train_step(model, cfg: ModelConfig, rt: RuntimeConfig, tx,
                    ignore_index: int = 0, watch_grads: bool = False):
    # remat: recompute per-frame activations in the BPTT backward.
    # rt.remat_mode="selective" keeps cheap activations and recomputes only
    # the rowified conv neighborhoods.  A/B at flagship LiDAR scale
    # (scripts/train_bench.py --remat, real TPU): full 1.017 s/step,
    # selective 0.939 s, none 0.911 s -- at the honest capacities even
    # "none" fits in HBM on one chip, but remat headroom matters once
    # longer windows (frames>4) or batching raise the activation footprint.
    seq_fwd = make_sequence_forward(model, cfg, rt,
                                    remat=getattr(rt, "remat_mode", "full")
                                    or "full")

    def loss_one(params, positions, values, labels, mask, rng=None):
        # train path: stochastic dropout (the reference's model.train());
        # eval path (rng=None) stays deterministic
        logp, sv, aux = seq_fwd(params, positions, values, mask,
                                deterministic=rng is None, rng=rng)
        loss, parts = segmentation_loss(logp, labels[-1], mask[-1], ignore_index)
        return loss, (logp, parts, aux)

    def batch_loss(params, batch: SeqBatch, rng):
        b = batch.positions.shape[0]
        keys = jax.random.split(rng, b)
        if b == 1:
            # vmap-free fast path: at the reference's batch_size=1 the
            # batched wrapper costs ~0.35 s/step at flagship scale (r4
            # profile_backward: vmapped fwd+loss 0.504 s vs 0.156 s for
            # the identical unvmapped inference forward -- the batching
            # rules of the build's sorts/scatters/Pallas scans lower far
            # worse than the plain ops).  Outputs are reshaped to the
            # exact (1, ...) batched structure, and the rng key matches
            # keys[0] of the vmapped path bit-for-bit.
            loss, (logp, parts, aux) = loss_one(
                params, batch.positions[0], batch.values[0],
                batch.labels[0], batch.mask[0], keys[0])
            one = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None],
                                         (loss, logp, parts, aux))
            losses, logp, parts, aux = one[0], one[1], one[2], one[3]
            return jnp.mean(losses), (logp, parts, aux)
        losses, (logp, parts, aux) = jax.vmap(
            loss_one, in_axes=(None, 0, 0, 0, 0, 0))(
                params, batch.positions, batch.values, batch.labels,
                batch.mask, keys)
        return jnp.mean(losses), (logp, parts, aux)

    base_key = jax.random.PRNGKey(0x5EED)

    @jax.jit
    def train_step(state: TrainState, batch: SeqBatch, lr_scale):
        rng = jax.random.fold_in(base_key, state.step)

        def lfn(p):
            return batch_loss(p, batch, rng)
        (loss, (logp, parts, aux)), grads = jax.value_and_grad(
            lfn, has_aux=True)(state.params)
        opt_state = state.opt_state
        opt_state.hyperparams["lr_scale"] = jnp.asarray(lr_scale, jnp.float32)
        updates, opt_state = tx.update(grads["params"], opt_state,
                                       state.params["params"])
        params = {"params": optax.apply_updates(state.params["params"], updates)}
        new_state = TrainState(params, opt_state, state.step + 1)
        # gradient observability: the flax analog of the reference's
        # wandb.watch(model) gradient tracking (callbacks/wandb_callback.py:18)
        gsq = jax.tree_util.tree_map(lambda g: jnp.sum(g.astype(jnp.float32)
                                                       ** 2), grads["params"])
        grad_norm = jnp.sqrt(sum(jax.tree_util.tree_leaves(gsq)))
        metrics = {"loss": loss,
                   "lovasz": jnp.mean(parts["lovasz"]),
                   "nll": jnp.mean(parts["nll"]),
                   "grad_norm": grad_norm,
                   "nr_vertices": jnp.max(aux["nr_vertices"]),
                   "vertex_overflow": jnp.any(aux["vertex_overflow"])}
        if watch_grads:
            # per-parameter gradient norms, the full analog of the
            # reference's wandb.watch(model) (callbacks/wandb_callback.py:
            # 18).  In-graph sqrt of the per-leaf sums already computed for
            # grad_norm; fetched as ONE small tree per step (device_get in
            # the loop), so the tunnel pays one transfer, not one per leaf.
            flat = jax.tree_util.tree_flatten_with_path(gsq)[0]
            metrics["grad_norms"] = {
                "/".join(str(p.key) for p in path): jnp.sqrt(v)
                for path, v in flat}
        return new_state, logp, metrics

    # forward+loss on the SAME stochastic path as train_step (fold_in rng,
    # dropout on) but with no value_and_grad / optimizer -- the honest
    # baseline for backward-cost attribution (scripts/profile_backward.py):
    # the 'carry+logits - fwd+loss' delta is then purely grad machinery +
    # AdamW floor, not dropout/RNG differences.
    @jax.jit
    def loss_step(params, batch: SeqBatch, step):
        rng = jax.random.fold_in(base_key, step)
        loss, (logp, parts, aux) = batch_loss(params, batch, rng)
        metrics = {"loss": loss,
                   "lovasz": jnp.mean(parts["lovasz"]),
                   "nll": jnp.mean(parts["nll"]),
                   "nr_vertices": jnp.max(aux["nr_vertices"]),
                   "vertex_overflow": jnp.any(aux["vertex_overflow"])}
        return logp, metrics

    @jax.jit
    def eval_step(params, batch: SeqBatch):
        if batch.positions.shape[0] == 1:
            # same vmap-free B=1 fast path as batch_loss
            loss, (logp, parts, aux) = loss_one(
                params, batch.positions[0], batch.values[0],
                batch.labels[0], batch.mask[0])
            losses, logp, aux = (jnp.asarray(loss)[None], logp[None],
                                 jax.tree_util.tree_map(
                                     lambda x: jnp.asarray(x)[None], aux))
        else:
            losses, (logp, parts, aux) = jax.vmap(
                loss_one, in_axes=(None, 0, 0, 0, 0))(
                    params, batch.positions, batch.values, batch.labels,
                    batch.mask)
        return logp, {"loss": jnp.mean(losses),
                      "nr_vertices": jnp.max(aux["nr_vertices"]),
                      "vertex_overflow": jnp.any(aux["vertex_overflow"])}

    # pre-optimizer gradients on train_step's exact stochastic path: the
    # probe behind the DP equality tests' tight grad-level check (VERDICT
    # r4 item 6 -- "grads differ only by reduction order" is asserted on
    # the grads themselves, not inferred through AdamW's amplification).
    @jax.jit
    def grad_step(params, batch: SeqBatch, step):
        rng = jax.random.fold_in(base_key, step)
        (loss, _), grads = jax.value_and_grad(
            lambda p: batch_loss(p, batch, rng), has_aux=True)(params)
        return loss, grads

    train_step.loss_step = loss_step
    train_step.grad_step = grad_step
    return train_step, eval_step


def make_streaming_inference(model: LNNSeq, cfg: ModelConfig,
                             rt: RuntimeConfig):
    """Online (frame-at-a-time) inference: jitted step functions over the
    streaming per-frame path -- the direct analog of the reference's
    per-frame ``model(lattice, positions, values, early_return)`` call
    (train_ln.py:175).

    Returns (new_state_fn, step_fn, final_fn):
      new_state_fn()                          -> fresh SeqState
      step_fn(params, pos, vals, mask, state) -> state          (early_return)
      final_fn(params, pos, vals, mask, state) -> (logp, sv, state, aux)
    """

    # jitted: an eager reset dispatches dozens of tiny array creations,
    # pathological over a remote-TPU tunnel (~31 ms each)
    new_state_fn = jax.jit(lambda: init_state(cfg, rt))

    @jax.jit
    def step_fn(params, positions, values, mask, state):
        _, state, _ = model.apply(params, positions, values, mask, state,
                                  final=False)
        return state

    @jax.jit
    def final_fn(params, positions, values, mask, state):
        (logp, sv), state, aux = model.apply(params, positions, values, mask,
                                             state, final=True)
        return logp, sv, state, aux

    return new_state_fn, step_fn, final_fn


def make_streaming_inference_incremental(model: LNNSeq, cfg: ModelConfig,
                                         rt: RuntimeConfig,
                                         max_new: int = 8192):
    """Streaming inference with incremental structure updates: the fast
    serving path.

    ``make_streaming_inference`` rebuilds every level's neighbor table and
    coarse links from scratch each frame (capacity x 8 lookups per level);
    consecutive scans share ~85% of their vertices, so frames t >= 1 here
    only look up the <= ``max_new`` NEW vertices per level
    (lattice_ops.update_neighbor_table / grow_coarse_table_incremental)
    and patch the carried structures.

    ``max_new`` is a static per-frame growth bound; if a frame adds more
    vertices, the extras get no adjacency (detectable: compare consecutive
    counts on the host and fall back to the full path).  Size it from
    occupancy deltas (utils/autotune.py).

    Returns (new_fn, step_full, step_inc, final_inc) -- the HOST chooses
    the branch (step_full for frame 0, whose growth exceeds max_new;
    step_inc afterwards).  Explicit host choice keeps each jitted step
    free of the other branch's code (an earlier in-graph lax.cond variant
    worked too once max_new was sized right -- 125 vs 156 ms/frame at
    max_new=8192 -- but compiled both branches into every step).
      new_fn()                                   -> (SeqState, FrameStructures)
      step_*(params, pos, vals, mask, st, fs)    -> (st, fs)
      final_inc(params, pos, vals, mask, st, fs) -> (logp, sv, st, fs, aux)
    """
    from ..ops import lattice_ops as lo

    L = cfg.nr_downsamples
    caps = rt.capacities(L)
    subtract_mean = cfg.experiment not in (
        "pointnet_no_local_mean", "pointnet_no_elevate_no_local_mean")

    def empty_structures():
        nbrs = tuple(
            lo.NeighborTable(idx=jnp.zeros((c, 9), jnp.int32),
                             found=jnp.zeros((c, 9), bool))
            for c in caps)
        links = tuple(
            lo.LevelLink(corner_idx=jnp.zeros((caps[i], 4), jnp.int32),
                         corner_bary=jnp.zeros((caps[i], 4), jnp.float32))
            for i in range(L))
        counts = tuple(jnp.int32(1) for _ in caps)
        return lo.FrameStructures(nbrs=nbrs, links=links, counts=counts)

    # jitted: see make_streaming_inference's new_state_fn note
    new_fn = jax.jit(lambda: (init_state(cfg, rt), empty_structures()))

    from ..models.lnn_seq import SeqState

    def advance(state, positions, mask, fs, incremental):
        """Distribute this frame, then update structures.  ``incremental``
        is a PYTHON bool (two jitted specialisations): the caller uses the
        full build for frame 0 (its growth far exceeds max_new) and the
        incremental patch for later frames."""
        old_counts = [t.count for t in state.tables]
        t0, dist = lo.distribute(state.tables[0], positions, mask, rt.sigma,
                                 subtract_local_mean=subtract_mean)
        coarse = tuple(state.tables[1:])
        tabs = [t0]
        if not incremental:
            links, nbrs = [], [lo.build_neighbor_table(t0)]
            for i in range(L):
                c, link = lo.grow_coarse_table(tabs[i], coarse[i])
                tabs.append(c)
                links.append(link)
                nbrs.append(lo.build_neighbor_table(c))
            overflowed = fs.overflowed
        else:
            nbrs, links = list(fs.nbrs), list(fs.links)
            nbrs[0] = lo.update_neighbor_table(t0, nbrs[0], old_counts[0],
                                               max_new)
            for i in range(L):
                c, links[i] = lo.grow_coarse_table_incremental(
                    tabs[i], coarse[i], old_counts[i], links[i], max_new)
                tabs.append(c)
                nbrs[i + 1] = lo.update_neighbor_table(
                    c, nbrs[i + 1], old_counts[i + 1], max_new)
            # sticky overflow detection: growth beyond max_new left rows
            # without adjacency/link entries -- results are degraded until
            # the caller rebuilds with a larger bound
            grew = jnp.stack([tabs[l].count - old_counts[l]
                              for l in range(L + 1)])
            overflowed = fs.overflowed | jnp.any(grew > max_new)
        fs = lo.FrameStructures(nbrs=tuple(nbrs), links=tuple(links),
                                counts=tuple(t.count for t in tabs),
                                overflowed=overflowed)
        state = SeqState(tables=tuple(tabs), h=state.h,
                        prev_counts=state.prev_counts, t=state.t)
        return state, fs, dist

    def make_step(incremental, final):
        @jax.jit
        def fn(params, positions, values, mask, state, fs):
            state2, fs2, dist = advance(state, positions, mask, fs,
                                        incremental)
            if final:
                (logp, sv), state2, aux = model.apply(
                    params, positions, values, mask, state2, final=True,
                    pre=(fs2, dist))
                return logp, sv, state2, fs2, aux
            _, state2, _ = model.apply(params, positions, values, mask,
                                       state2, final=False, pre=(fs2, dist))
            return state2, fs2
        return fn

    step_full = make_step(False, False)
    step_inc = make_step(True, False)
    final_inc = make_step(True, True)
    return new_fn, step_full, step_inc, final_inc


def make_streaming_inference_batched(model: LNNSeq, cfg: ModelConfig,
                                     rt: RuntimeConfig, mesh=None,
                                     incremental: bool = False,
                                     max_new: int = 8192):
    """Serving-scale inference DP (SURVEY 2.7): B concurrent streams, each
    with its own ``SeqState`` (and, with ``incremental=True``, its own
    ``FrameStructures``), vmapped over a leading stream axis.  With a
    ``mesh`` the stream axis shards over its ``dp`` devices: params stay
    replicated, every per-frame step runs embarrassingly parallel (no
    collectives -- streams are independent), so per-stream latency is the
    single-stream latency while throughput scales with the chip count.

    The reference serves strictly one scan stream per process
    (test_ln.py:163-239); this is the TPU-native scale-out story for
    deployment.

    Returns (new_states_fn, step_fn, final_fn):
      new_states_fn(B)   -> stacked per-stream carry (leading axis B)
      step_fn(params, pos(B,P,3), vals(B,P,C), mask(B,P), carry) -> carry
      final_fn(...)      -> (logp (B,P,K), sv, carry, aux)
    Per-stream outputs are bit-identical to the single-stream path
    (tested in tests/test_train.py).
    """
    if incremental:
        new1, step_full1, step_inc1, final1 = \
            make_streaming_inference_incremental(model, cfg, rt, max_new)
        step1 = step_inc1
    else:
        new1, step1, final1 = make_streaming_inference(model, cfg, rt)

    def _shard(tree, spec_leading=True):
        if mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P("dp") if spec_leading else P())
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

    def new_states_fn(b: int):
        one = new1()
        stacked = jax.jit(
            lambda t: jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (b,) + x.shape), t))(one)
        return _shard(stacked)

    # vmap over the stream axis; params broadcast.  jit AFTER vmap so XLA
    # sees the sharded leading axis and partitions every op along it.
    if incremental:
        @jax.jit
        def step_fn(params, positions, values, mask, carry):
            st, fs = carry

            def body(p_, v_, m_, s_, f_):
                return step_inc1.__wrapped__(params, p_, v_, m_, s_, f_)
            st, fs = jax.vmap(body)(positions, values, mask, st, fs)
            return st, fs

        @jax.jit
        def step_full_fn(params, positions, values, mask, carry):
            st, fs = carry

            def body(p_, v_, m_, s_, f_):
                return step_full1.__wrapped__(params, p_, v_, m_, s_, f_)
            st, fs = jax.vmap(body)(positions, values, mask, st, fs)
            return st, fs

        @jax.jit
        def final_fn(params, positions, values, mask, carry):
            st, fs = carry

            def body(p_, v_, m_, s_, f_):
                return final1.__wrapped__(params, p_, v_, m_, s_, f_)
            logp, sv, st, fs, aux = jax.vmap(body)(positions, values, mask,
                                                   st, fs)
            return logp, sv, (st, fs), aux

        return new_states_fn, step_full_fn, step_fn, final_fn

    @jax.jit
    def step_fn(params, positions, values, mask, states):
        def body(p_, v_, m_, s_):
            return step1.__wrapped__(params, p_, v_, m_, s_)
        return jax.vmap(body)(positions, values, mask, states)

    @jax.jit
    def final_fn(params, positions, values, mask, states):
        def body(p_, v_, m_, s_):
            return final1.__wrapped__(params, p_, v_, m_, s_)
        logp, sv, states, aux = jax.vmap(body)(positions, values, mask,
                                               states)
        return logp, sv, states, aux

    return new_states_fn, step_fn, final_fn
