"""Host-side training/eval orchestration: the ``train_ln.run`` /
``test_ln.run`` equivalents (/root/reference/train_ln.py:62-268,
/root/reference/test_ln.py:64-268) over the jitted engine.

Differences from the reference, by design:
* parameters are created eagerly at startup (no lazy-params checkpoint
  dance, train_ln.py:178-209);
* checkpoints include optimiser state and support exact resume;
* any batch size B >= 1 of sequences, sharded across a device mesh when one
  is provided (the reference hardcodes batch_size=1, train_ln.py:56).
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np

import jax

from ..config import (ModelConfig, RuntimeConfig, cfgParser,
                      model_config_from_cfg, nr_classes_from_cfg,
                      runtime_config_from_cfg)
from ..data.kitti import SemanticKittiDataset
from . import checkpoint as ckpt
from . import engine, optim
from .callbacks import CallbacksGroup, Phase, StateCallback, WandBCallback


def _prefetch(iterable, depth: int = 2):
    """Background-thread prefetch of assembled windows (the reference's 8
    loader workers, train_ln.py:56-57).  Per-frame file IO inside each item
    is already parallel C++ (native/kitti_loader.cpp); this overlaps window
    assembly + augmentation with device compute."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    done = object()

    def worker():
        try:
            for item in iterable:
                q.put(item)
        finally:
            q.put(done)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is done:
            return
        yield item


def _sequence_order(n: int, shuffle: bool, rng: np.random.Generator,
                    shard_by_process: bool = False):
    """Epoch order of sequence indices; optionally sharded per host.

    Multi-host (multi-process) runs put the dp axis across DCN: every
    process runs the SAME jitted step over its local devices, and only
    gradient all-reduce crosses hosts (handled by jax's global mesh).  The
    data pipeline must therefore feed each process a DISJOINT slice of the
    epoch: all hosts draw the identical shuffle (same seed), then process i
    takes indices i::process_count, truncated to the common length so
    every host runs the same number of steps (a straggler host would
    deadlock the collective).  Single-process runs are unchanged.
    """
    order = np.arange(n)
    if shuffle:
        rng.shuffle(order)
    if shard_by_process and jax.process_count() > 1:
        per = n // jax.process_count()
        order = order[jax.process_index()::jax.process_count()][:per]
    return order


def make_datasets(parser: cfgParser, cfg: ModelConfig, rt: RuntimeConfig,
                  splits=("train", "valid")):
    lc = parser.get_loader_vars()
    mc = parser.get_model_vars()
    if parser._dataset_name() == "parislille":
        from ..data.parislille import ParisLille3DDataset
        ds_cls = ParisLille3DDataset
    else:
        ds_cls = SemanticKittiDataset
    return {
        s: ds_cls(s, lc, mc, cfg.sequence_learning, max_points=rt.max_points)
        for s in splits
    }


def run_training(config_file: str, max_steps: int | None = None,
                 datasets=None):
    from ..utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    parser = cfgParser(config_file)
    train_cfg = parser.get_train_vars()
    loader_cfg = parser.get_loader_vars()
    label_cfg = parser.get_label_mngr_vars()
    ignore_index = label_cfg.get("unlabeled_idx", 0)

    nr_classes = nr_classes_from_cfg(parser)
    cfg = model_config_from_cfg(parser, nr_classes)
    rt = runtime_config_from_cfg(parser)

    model, state, tx = engine.create_train_state(
        cfg, rt, lr=train_cfg["lr"], weight_decay=train_cfg["weight_decay"])
    train_step, eval_step = engine.make_train_step(
        model, cfg, rt, tx, ignore_index,
        # wandb.watch(model)-equivalent per-parameter gradient norms; only
        # paid for (one extra small tree fetch/step) when wandb is on
        watch_grads=bool(train_cfg.get("with_wandb")))
    # device-side argmax: fetching (B,P) int32 predictions instead of the
    # (B,P,nr_classes) float32 log-probs is ~26x less tunnel traffic per
    # window (13.6 MB -> 0.5 MB at 131k points / 26 classes)
    pred_fn = jax.jit(lambda lp: jax.numpy.argmax(lp, axis=-1)
                      .astype(jax.numpy.int32))

    if datasets is None:
        datasets = make_datasets(parser, cfg, rt)

    if train_cfg.get("load_checkpoint"):
        path = os.path.join(train_cfg["checkpoint_path"],
                            train_cfg["load_checkpoint_model"])
        restored = ckpt.load(path, state.params, state.opt_state, cfg=cfg)
        state = engine.TrainState(restored["params"], restored["opt_state"],
                                  restored["step"])
        print("loaded checkpoint:", path)

    cbs = [StateCallback()]
    if train_cfg.get("with_wandb"):
        cbs.append(WandBCallback("temporal_latticenet_tpu", parser.contents))
    if train_cfg.get("with_visdom"):
        from .callbacks import PlotCallback
        cbs.append(PlotCallback(os.path.join(
            train_cfg.get("checkpoint_path", "."), "plots")))
    cb = CallbacksGroup(cbs)

    # core.debug_with_profiler: capture a jax.profiler trace of the first
    # training steps (the reference gates an external C++ profiler on this
    # flag, SURVEY.md 5.1)
    profiler_dir = None
    if parser.get_core_vars().get("debug_with_profiler"):
        profiler_dir = os.path.join(
            train_cfg.get("checkpoint_path", "."), "profile")
        import jax as _jax
        os.makedirs(profiler_dir, exist_ok=True)
        _jax.profiler.start_trace(profiler_dir)

    # batch_size > 1 shards whole sequences across the dp device mesh
    # (the reference hardcodes batch_size=1 and has no distributed layer --
    # SURVEY.md 2.7; this is the TPU-native scaling path, tested for exact
    # gradient agreement in tests/test_train.py)
    bs = int(train_cfg.get("batch_size", 1))
    dp_mesh = None
    if bs > 1:
        import jax as _jax
        from ..parallel import mesh as pmesh
        n_dev = min(bs, _jax.local_device_count())
        if n_dev > 1 and bs % n_dev == 0:
            dp_mesh = pmesh.make_mesh(n_dev)
            state = engine.TrainState(
                pmesh.replicate(dp_mesh, state.params),
                pmesh.replicate(dp_mesh, state.opt_state), state.step)
            print(f"data parallel: {bs} sequences/step over {n_dev} devices")
        else:
            print(f"batch_size={bs} on one device (vmapped)")

    phases = [Phase("train", datasets["train"], grad=True),
              Phase("valid", datasets["valid"], grad=False)]

    # train.start_epoch: resume a crashed run from a per-epoch checkpoint
    # (pair with load_checkpoint).  Offsets the epoch loop, checkpoint
    # names, and the cosine-restarts schedule so the resumed run continues
    # the original trajectory instead of restarting it.
    start_epoch = int(train_cfg.get("start_epoch", 0))
    for phase in phases:
        phase.epoch_nr = start_epoch

    scheduler_kind = train_cfg.get("scheduler", "CosineAnnealingWarmRestarts")
    plateau = optim.ReduceLROnPlateau()
    restart_epochs = float(train_cfg.get("restart_epochs", 3))
    rng = np.random.default_rng(0)
    steps_done = 0

    for epoch in range(start_epoch, int(train_cfg["training_epochs"])):
        for phase in phases:
            cb.epoch_started(phase=phase)
            order = _sequence_order(len(phase.loader),
                                    phase.grad and loader_cfg.get("shuffle", False),
                                    rng, shard_by_process=phase.grad)
            group = bs if phase.grad else 1
            if phase.grad and len(order) < group:
                raise ValueError(
                    f"batch_size={group} exceeds the train split's "
                    f"{len(order)} sequences: every epoch would run zero "
                    f"optimiser steps. Lower train.batch_size.")
            n_steps_epoch = max(len(order) // group, 1)
            it = _prefetch(phase.loader[int(i)] for i in order)

            def grouped(items, k):
                buf = []
                for item in items:
                    buf.append(item)
                    if len(buf) == k:
                        yield buf
                        buf = []
                # remainder dropped when k > 1: sharded steps need a full
                # batch; one epoch's tail rejoins via next epoch's shuffle

            for seq_i, seqs in enumerate(grouped(it, group)):
                batch = engine.SeqBatch.stack(seqs)
                if phase.grad:
                    if scheduler_kind == "CosineAnnealingWarmRestarts":
                        frac = phase.epoch_nr + seq_i / n_steps_epoch
                        lr_scale = optim.cosine_warm_restarts(frac, restart_epochs)
                    else:
                        lr_scale = plateau.scale
                    if dp_mesh is not None:
                        from ..parallel import mesh as pmesh
                        batch = pmesh.shard_batch(dp_mesh, batch)
                    state, logp, metrics = train_step(state, batch, lr_scale)
                else:
                    logp, metrics = eval_step(state.params, batch)
                    lr_scale = 0.0

                preds = np.asarray(pred_fn(logp))
                for bi, frames in enumerate(seqs):
                    last = frames[-1]
                    cb.after_forward_pass(
                        phase=phase, loss=float(metrics["loss"]),
                        loss_dice=float(metrics.get("lovasz", 0.0)),
                        grad_norm=float(metrics.get("grad_norm", 0.0)),
                        grad_norms=(jax.device_get(metrics["grad_norms"])
                                    if "grad_norms" in metrics else None),
                        pred_labels=preds[bi][last.mask],
                        nr_classes=cfg.nr_classes,
                        target=last.labels[last.mask],
                        ignore_index=ignore_index, lr=lr_scale)

                steps_done += 1
                if bool(metrics.get("vertex_overflow", False)):
                    print("WARNING: vertex table saturated this sequence "
                          "(capacity reached; any further vertices were "
                          "dropped to the invalid bucket); raise "
                          "runtime.capacity_level0 (see utils/autotune.py)")
                # periodic fault-tolerance checkpoint (weights + optimiser +
                # step): the failure-recovery layer the reference lacks
                # (SURVEY.md 5.3 -- crash = lost run there)
                every = train_cfg.get("save_every_n_steps", 0)
                if (phase.grad and every and steps_done % every == 0
                        and train_cfg.get("save_checkpoint")):
                    ckpt.save(os.path.join(train_cfg["checkpoint_path"],
                                           "latest.ckpt"),
                              state.params, state.opt_state, int(state.step))
                if max_steps is not None and steps_done >= max_steps:
                    break

            name = ckpt.checkpoint_name(
                loader_cfg.get("include_moving_classes", False),
                train_cfg["dataset_name"], cfg.values_mode, rt.sigma,
                cfg.rnn_modules, cfg.frames_per_seq,
                loader_cfg.get("cloud_scope", 1), epoch,
                loader_cfg.get("accumulate_clouds", False))
            if phase.grad and train_cfg.get("save_checkpoint"):
                path = os.path.join(train_cfg["checkpoint_path"], name + ".ckpt")
                ckpt.save(path, state.params, state.opt_state, int(state.step))
                print("saved checkpoint:", path)
            if not phase.grad and scheduler_kind == "ReduceLROnPlateau":
                plateau.step(phase.loss_acum_per_epoch)
            cb.epoch_ended(phase=phase,
                           checkpoint_path=train_cfg.get("checkpoint_path"),
                           name=name)
        if max_steps is not None and steps_done >= max_steps:
            break
        if profiler_dir is not None:
            import jax as _jax
            _jax.profiler.stop_trace()
            print("profiler trace written to", profiler_dir)
            profiler_dir = None
    return state


def run_eval(config_file: str, split: str = "test", max_seqs: int | None = None,
             datasets=None, checkpoint_path: str | None = None):
    """Evaluation / prediction writing (test_ln.py parity): runs the chosen
    split and optionally writes per-point ``.label`` files in the
    semantic-kitti-api submission layout (test_ln.py:192-231)."""
    from ..utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    parser = cfgParser(config_file)
    eval_cfg = parser.get_eval_vars()
    loader_cfg = parser.get_loader_vars()
    label_cfg = parser.get_label_mngr_vars()
    ignore_index = label_cfg.get("unlabeled_idx", 0)

    nr_classes = nr_classes_from_cfg(parser)
    cfg = model_config_from_cfg(parser, nr_classes)
    rt = runtime_config_from_cfg(parser)

    model, state, tx = engine.create_train_state(cfg, rt, lr=1e-3,
                                                 weight_decay=0.0)
    _, eval_step = engine.make_train_step(model, cfg, rt, tx, ignore_index)
    pred_fn = jax.jit(lambda lp: jax.numpy.argmax(lp, axis=-1)
                      .astype(jax.numpy.int32))

    path = checkpoint_path or (
        os.path.join(eval_cfg["checkpoint_path"],
                     eval_cfg["load_checkpoint_model"])
        if eval_cfg.get("load_checkpoint_model") else None)
    if path:
        restored = ckpt.load(path, state.params, cfg=cfg)
        state = engine.TrainState(restored["params"], state.opt_state,
                                  restored["step"])
        print("loaded checkpoint:", path)

    if datasets is None:
        datasets = make_datasets(parser, cfg, rt, splits=(split,))
    ds = datasets[split]

    phase = Phase(split, ds, grad=False)
    cb = CallbacksGroup([StateCallback()])
    cb.epoch_started(phase=phase)

    write_preds = eval_cfg.get("do_write_predictions", False)
    out_root = eval_cfg.get("output_predictions_path", "./predictions")

    for seq_i, frames in enumerate(_prefetch(iter(ds))):
        batch = engine.SeqBatch.stack([frames])
        logp, metrics = eval_step(state.params, batch)
        last = frames[-1]
        pred = np.asarray(pred_fn(logp))[0][last.mask]
        cb.after_forward_pass(
            phase=phase, loss=float(metrics["loss"]),
            pred_labels=pred, nr_classes=cfg.nr_classes,
            target=last.labels[last.mask],
            ignore_index=ignore_index, lr=0.0)

        if write_preds:
            # semantic-kitti-api layout:
            # predictions/sequences/<seq>/predictions/<scan>.label
            # In ACCUM mode only the LAST scan's points are written
            # (test_ln.py:221: l_pred[-len_seq[-1]:]); scoring above keeps
            # every accumulated point, also like the reference.  We write
            # the binary devkit format, not the text file the reference
            # overwrites it with (PARITY.md).
            base = os.path.splitext(os.path.basename(last.path))[0]
            seq_dir = os.path.basename(
                os.path.dirname(os.path.dirname(last.path)))
            out_dir = os.path.join(out_root, "sequences", seq_dir, "predictions")
            os.makedirs(out_dir, exist_ok=True)
            pred_last = pred[-last.last_n:] if last.last_n else pred
            pred_last.astype(np.uint32).tofile(
                os.path.join(out_dir, base + ".label"))

        if max_seqs is not None and seq_i + 1 >= max_seqs:
            break

    if (write_preds and max_seqs is None
            and parser._dataset_name() != "parislille"):
        # submission completeness report (the reference pipeline's
        # validate_submission.py step, test_ln.py:234-248) -- informative,
        # not fatal: window clamping at sequence starts can legitimately
        # leave the first frames_per_seq-1 scans without predictions
        try:
            try:
                import evaluate_semantics as _es   # repo root on sys.path
            except ImportError:
                import importlib.util as _ilu
                spec = _ilu.spec_from_file_location(
                    "evaluate_semantics",
                    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "..", "..", "evaluate_semantics.py"))
                _es = _ilu.module_from_spec(spec)
                spec.loader.exec_module(_es)
            _es.validate(loader_cfg["dataset_path"], out_root, split=split)
        except Exception as e:  # validation is reporting, never fatal here
            print(f"submission validation skipped: {e!r}")

    mean_iou = phase.scores.avg_class_iou()
    cb.epoch_ended(phase=phase)
    return mean_iou, phase
