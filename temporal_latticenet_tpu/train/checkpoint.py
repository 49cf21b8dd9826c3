"""Checkpointing: weights + optimiser state (an improvement over the
reference, which saves weights only -- /root/reference/train_ln.py:252-255,
SURVEY.md 5.4), with the reference's config-encoding filename scheme."""

from __future__ import annotations

import os
from datetime import datetime

import flax.serialization
import jax


def checkpoint_name(include_moving: bool, dataset_name: str, values_mode: str,
                    sigma: float, rnn_modules, frames: int, scope: int,
                    epoch: int, accumulate_clouds: bool = False) -> str:
    """Reproduces the reference filename schema (train_ln.py:250)."""
    date_time = datetime.now().strftime("%d%m%Y_%H%M")
    return "{}_{}_{}_{}_sigma{}_type{}_frames{}_scope{}_epoch{}".format(
        date_time,
        "multi" if include_moving else "single",
        "Kitti" if dataset_name == "semantickitti" else "Paris",
        "Ref" if values_mode == "reflectance" else "xyz",
        str(sigma)[0:3],
        "-".join(rnn_modules) if not accumulate_clouds else "ACCUM",
        frames, scope, epoch)


def save(path: str, params, opt_state=None, step: int = 0):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {"params": params, "step": step}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))


def load(path: str, params_template, opt_state_template=None, cfg=None):
    """Restore into templates (shape/dtype skeletons from a fresh init).

    A ``.pt`` path routes through the torch converter (the reference's
    pretrained checkpoints, BASELINE.json config 4): keys are mapped,
    every leaf is shape-validated against the template (per-key error
    report on mismatch -- torch_convert.validate_converted), and the
    optimiser state starts fresh (the reference saves weights only,
    train_ln.py:252-255)."""
    if path.endswith(".pt"):
        if cfg is None:
            raise ValueError("loading a .pt checkpoint needs the model cfg")
        from . import torch_convert as tc
        params = tc.load_pt_checkpoint(path, cfg, params_template)
        out = {"params": params, "step": 0}
        if opt_state_template is not None:
            out["opt_state"] = opt_state_template
        return out
    with open(path, "rb") as f:
        data = f.read()
    template = {"params": params_template, "step": 0}
    if opt_state_template is not None:
        template["opt_state"] = opt_state_template
    restored = flax.serialization.from_bytes(template, data)
    return restored
