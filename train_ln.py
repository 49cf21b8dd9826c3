#!/usr/bin/env python3
"""Training CLI, mirroring the reference entry point
(``python train_ln.py --dataset semantickitti``,
/root/reference/train_ln.py:271-281; README.md:100)."""

import argparse
import os
import sys


def run(dataset_name: str = "semantickitti", config_file: str | None = None):
    from temporal_latticenet_tpu.train.loop import run_training
    cwd = os.getcwd()
    if config_file is None:
        if dataset_name == "semantickitti":
            config_file = os.path.join(cwd, "seq_config/lnn_train_semantic_kitti.cfg")
        elif dataset_name == "parislille":
            config_file = os.path.join(cwd, "seq_config/lnn_train_paris_lille.cfg")
        else:
            sys.exit(f"Dataset name not recognized. It is {dataset_name}. "
                     "Available options are semantickitti or parislille.")
    print("Config file:", config_file)
    return run_training(config_file)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Train the network on a dataset.")
    parser.add_argument("--dataset", type=str, nargs="?", const="semantickitti",
                        default="semantickitti",
                        help="semantickitti OR parislille")
    parser.add_argument("--config", type=str, default=None,
                        help="override the config file path")
    args = parser.parse_args()
    run(args.dataset, args.config)
