"""Model input assembly and introspection helpers.

* ``prepare_cloud``: builds (positions, values, target) arrays from a cloud
  record according to ``positions_mode`` / ``values_mode``, mirroring
  ``LNN_SEQ.prepare_cloud`` (/root/reference/seq_lattice/models.py:483-531).
* ``summary``: parameter-count tree printer, the analog of the reference's
  ``summary`` (/root/reference/seq_lattice/models.py:551-602).
"""

from __future__ import annotations

import sys

import numpy as np

import jax


class Cloud:
    """Minimal stand-in for the easy_pbr Mesh record the reference passes
    around (fields V/C/I/L_gt, kitti_dataloader.py:294-312)."""

    def __init__(self, V=None, C=None, I=None, L_gt=None):
        self.V, self.C, self.I, self.L_gt = V, C, I, L_gt


def prepare_cloud(cloud: Cloud, positions_mode: str = "xyz",
                  values_mode: str = "reflectance"):
    """Returns (positions (N, P), values (N, V), target (N,)) float32/int32."""
    V = np.asarray(cloud.V, np.float32)
    if positions_mode == "xyz":
        positions = V
    elif positions_mode == "xyz+rgb":
        positions = np.concatenate([V, np.asarray(cloud.C, np.float32)], 1)
    elif positions_mode == "xyz+intensity":
        positions = np.concatenate([V, np.asarray(cloud.I, np.float32)], 1)
    else:
        raise ValueError(f"positions mode {positions_mode!r} not implemented")

    if values_mode == "none":
        values = np.zeros((V.shape[0], 1), np.float32)
    elif values_mode in ("intensity", "reflectance"):
        values = np.asarray(cloud.I, np.float32).reshape(V.shape[0], -1)
    elif values_mode == "rgb":
        values = np.asarray(cloud.C, np.float32)
    elif values_mode == "rgb+height":
        values = np.concatenate(
            [np.asarray(cloud.C, np.float32), V[:, 1:2]], 1)
    elif values_mode == "rgb+xyz":
        values = np.concatenate([np.asarray(cloud.C, np.float32), V], 1)
    elif values_mode == "height":
        values = V[:, 1:2]
    elif values_mode == "xyz":
        values = V
    else:
        raise ValueError(f"values mode {values_mode!r} not implemented")

    target = (np.asarray(cloud.L_gt).reshape(-1).astype(np.int32)
              if cloud.L_gt is not None else None)
    return positions, values, target


def summary(params, file=sys.stderr) -> int:
    """Print a per-subtree parameter count; returns the total."""
    total = 0

    def walk(tree, indent):
        nonlocal total
        for k in sorted(tree.keys()):
            v = tree[k]
            if isinstance(v, dict):
                sub = sum(int(np.prod(l.shape))
                          for l in jax.tree_util.tree_leaves(v))
                print(f"{'  ' * indent}{k}: {sub:,} params", file=file)
                walk(v, indent + 1)
            else:
                total += int(np.prod(np.shape(v)))

    tree = params.get("params", params)
    walk(tree, 0)
    total = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))
    print(f"TOTAL: {total:,} params", file=file)
    return total
