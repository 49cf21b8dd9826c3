"""Tracing / profiling utilities.

The reference gates an external C++ profiler behind
``core.debug_with_profiler`` and leaves commented TIME_START/TIME_END spans
in the model (models.py:302-439; SURVEY.md 5.1).  TPU-natively this maps to
``jax.profiler`` traces plus ``jax.named_scope`` regions (the model wraps
its phases in the same names: "pointnet", "down_path", "up_path"), and
block-until-ready wall timers for quick spans.

Debug aids (SURVEY.md 5.2): ``enable_nan_debugging`` flips jax_debug_nans,
the TPU analog of torch.autograd.set_detect_anomaly (train_ln.py:36).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_timer(name: str, sink=print):
    t0 = time.perf_counter()
    yield
    sink(f"[{name}] {time.perf_counter() - t0:.4f}s")


def block(tree):
    """Block until every array in a pytree is ready (accurate timing)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree


def enable_nan_debugging(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
