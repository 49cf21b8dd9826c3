#!/usr/bin/env python3
"""Evaluation / submission CLI, mirroring the reference
(``python test_ln.py --dataset semantickitti``,
/root/reference/test_ln.py:274-284).  Writes per-point ``.label`` files in
the semantic-kitti-api layout when ``eval.do_write_predictions`` is set;
use ``temporal_latticenet_tpu.data.kitti_meta.build_inverse_lut`` for the
--inverse remap step of the official submission pipeline
(test_ln.py:234-248)."""

import argparse
import os
import sys


def run(dataset_name: str = "semantickitti", config_file: str | None = None,
        split: str = "test"):
    from temporal_latticenet_tpu.train.loop import run_eval
    cwd = os.getcwd()
    if config_file is None:
        if dataset_name == "semantickitti":
            config_file = os.path.join(cwd, "seq_config/lnn_eval_semantic_kitti.cfg")
        elif dataset_name == "parislille":
            config_file = os.path.join(cwd, "seq_config/lnn_eval_paris_lille.cfg")
        else:
            sys.exit(f"Dataset name not recognized. It is {dataset_name}. "
                     "Available options are semantickitti or parislille.")
    print("Config file:", config_file)
    miou, _ = run_eval(config_file, split=split)
    print("mean IoU:", miou)
    return miou


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Evaluate on a dataset.")
    parser.add_argument("--dataset", type=str, nargs="?", const="semantickitti",
                        default="semantickitti")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--split", type=str, default="test",
                        choices=["valid", "test"])
    args = parser.parse_args()
    run(args.dataset, args.config, args.split)
