#!/usr/bin/env python3
"""Offline semantic evaluation of saved predictions against ground truth.

Native replacement for the external semantic-kitti-api scripts the reference
defers to (``remap_semantic_labels.py --inverse`` / ``evaluate_semantics.py``
/ ``validate_submission.py`` -- /root/reference/test_ln.py:234-248):

* reads ``.label`` predictions in the submission layout
  (``<pred_root>/sequences/<seq>/predictions/<scan>.label``);
* reads ground truth from the dataset layout, remapping raw labels through
  the learning map;
* supports predictions stored either as TRAINING ids (our test_ln output)
  or as RAW ids (a remapped submission) via ``--pred-format``;
* optional ``--remap-inverse`` rewrites training-id predictions to raw ids
  in place, producing a codalab-uploadable tree (the --inverse step);
* prints per-class and mean IoU (the official devkit metric).
"""

import argparse
import glob
import os

import numpy as np


def iter_scans(pred_root: str, sequences):
    for seq in sequences:
        pat = os.path.join(pred_root, "sequences", f"{seq:02d}", "predictions",
                           "*.label")
        for p in sorted(glob.glob(pat)):
            yield seq, int(os.path.splitext(os.path.basename(p))[0]), p


def run(dataset_path: str, pred_root: str, split: str = "valid",
        include_moving: bool = True, pred_format: str = "train",
        remap_inverse: bool = False, limit: int | None = None):
    from temporal_latticenet_tpu.data import kitti_meta
    from temporal_latticenet_tpu.train.metrics import Scores
    from temporal_latticenet_tpu.utils.label_mngr import LabelMngr

    lut = kitti_meta.build_remap_lut(include_moving)
    inv = kitti_meta.build_inverse_lut(include_moving)
    mngr = LabelMngr(dataset="semantickitti", include_moving=include_moving)
    scores = Scores()
    sequences = kitti_meta.SPLIT[split]

    n = 0
    for seq, scan, pred_path in iter_scans(pred_root, sequences):
        pred = np.fromfile(pred_path, dtype=np.uint32)
        if pred_format == "raw":
            pred_train = lut[pred & 0xFFFF]
        else:
            pred_train = pred.astype(np.int64)
            if remap_inverse:
                inv[pred_train].astype(np.uint32).tofile(pred_path)

        gt_path = os.path.join(dataset_path, "sequences", f"{seq:02d}",
                               "labels", f"{scan:06d}.label")
        if not os.path.exists(gt_path):
            continue
        raw = np.fromfile(gt_path, dtype=np.uint32)
        gt = lut[raw & 0xFFFF]
        if pred_train.shape[0] != gt.shape[0]:
            raise SystemExit(
                f"{pred_path}: {pred_train.shape[0]} predictions vs "
                f"{gt.shape[0]} ground-truth points")
        scores.accumulate_scores(pred_train, gt, unlabeled_idx=0,
                                 nr_classes=mngr.nr_classes())
        n += 1
        if limit and n >= limit:
            break

    if n == 0:
        raise SystemExit("no (prediction, ground truth) pairs found")
    avg, per_class = scores.compute_stats()
    for idx, iou in sorted(per_class.items()):
        print(f"  {mngr.label_name(idx):<24s} {iou:.4f}")
    print(f"mean IoU over {len(per_class)} classes, {n} scans: {avg:.4f}")
    return avg, per_class


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--predictions", required=True)
    ap.add_argument("--split", default="valid", choices=["train", "valid"])
    ap.add_argument("--single-scan", action="store_true",
                    help="20-class setting (no moving classes)")
    ap.add_argument("--pred-format", default="train", choices=["train", "raw"])
    ap.add_argument("--remap-inverse", action="store_true",
                    help="rewrite train-id predictions to raw ids in place")
    ap.add_argument("--limit", type=int, default=None)
    a = ap.parse_args()
    run(a.dataset, a.predictions, a.split, not a.single_scan, a.pred_format,
        a.remap_inverse, a.limit)
