"""Headless visualisation exports.

Replaces the reference's GL-based tools with artifact writers (SURVEY.md
7.4: the easy_pbr viewer is out of TPU scope; its *data* products are in):

* ``export_prediction_cloud`` -- colored prediction / GT / difference
  clouds as PLY (viewer_callback.py:15-42, RecordPLYs.py:44-141);
* ``export_aflow_arrays`` -- the AFlow attention data the interactive
  ``visualize_cli.py`` renders (weights + previous-frame neighbor indices +
  per-vertex mean positions, models.py:442-458,480-481), dumped as ``.npz``
  for offline plotting.  Note the reference's ``vis_aflow=True`` path is
  broken (models.py:444 references a removed attribute, SURVEY.md 3.5);
  here the data comes from the fusion modules' sown aux collection.
"""

from __future__ import annotations

import os

import numpy as np

from ..data.ply import write_ply_vertices
from .label_mngr import LabelMngr


def export_prediction_cloud(path: str, positions: np.ndarray,
                            pred: np.ndarray, label_mngr: LabelMngr,
                            gt: np.ndarray | None = None):
    """Write a point cloud PLY colored by predicted labels; when ``gt`` is
    given, also write ``*_gt.ply`` and ``*_diff.ply`` (red = wrong)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    pos = np.asarray(positions, np.float32)

    def write(p, colors_rgb01, labels):
        c = (np.clip(colors_rgb01, 0, 1) * 255).astype(np.uint8)
        write_ply_vertices(p, {
            "x": pos[:, 0], "y": pos[:, 1], "z": pos[:, 2],
            "red": c[:, 0], "green": c[:, 1], "blue": c[:, 2],
            "label": np.asarray(labels, np.uint32),
        })

    base, ext = os.path.splitext(path)
    write(path, label_mngr.color_from_label_indices(pred), pred)
    if gt is not None:
        write(base + "_gt" + ext, label_mngr.color_from_label_indices(gt), gt)
        wrong = (np.asarray(pred) != np.asarray(gt))
        diff = np.where(wrong[:, None], np.array([[1.0, 0.0, 0.0]]),
                        np.array([[0.7, 0.7, 0.7]]))
        write(base + "_diff" + ext, diff, wrong.astype(np.uint32))


def vertex_mean_positions(positions: np.ndarray, point_vertex: np.ndarray,
                          capacity: int) -> np.ndarray:
    """Per-vertex mean of contributing point positions (the scatter_mean of
    models.py:452-454), used to place lattice vertices in 3D for plots."""
    pv = np.asarray(point_vertex).reshape(-1)
    pos = np.repeat(np.asarray(positions), point_vertex.shape[1], axis=0)
    sums = np.zeros((capacity, 3))
    np.add.at(sums, pv, pos)
    cnt = np.zeros(capacity)
    np.add.at(cnt, pv, 1.0)
    return sums / np.maximum(cnt, 1.0)[:, None]


def export_aflow_arrays(path: str, aux_collection: dict,
                        positions: np.ndarray, point_vertex: np.ndarray,
                        capacity: int):
    """Dump AFlow weights/neighbors + vertex positions to ``.npz``.

    ``aux_collection`` is the flax ``aux`` variable collection returned by
    ``model.apply(..., mutable=["aux"])``; AFlowFusion sows
    ``aflow_weights`` (V, 9) and ``aflow_neighbors`` (V, 9) into it.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + k + "/")
            else:
                arr = v[0] if isinstance(v, (tuple, list)) else v
                flat[prefix + k] = np.asarray(arr)

    walk(aux_collection)
    flat["avg_position_per_vertex"] = vertex_mean_positions(
        positions, point_vertex, capacity)
    np.savez_compressed(path, **flat)
    return sorted(flat.keys())
