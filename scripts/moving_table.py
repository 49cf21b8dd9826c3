"""Render the moving-class comparison table from artifacts/moving_*.json.

The controlled experiment behind the table: identical dynamic-actor worlds
(data/lidar_like.py, actor-only car population, marginal-matched parked
counterparts) where motion across frames is the only signal separating
car/person (ids 1/6) from moving-car/moving-person (ids 20/22) — the
26-class setting of /root/reference/seq_config/semantic-kitti-all.yaml.
Writes artifacts/moving_comparison.md and prints it.
"""

import json
import os
import sys

VARIANTS = [
    ("temporal", "flagship gru-gru-aflow-gru (4 frames)"),
    ("accum", "accumulated cloud (4 scans, no fusion)"),
    ("static", "single frame (sequence_learning=false)"),
]
CLASSES = ["car", "person", "road", "building", "trunk", "pole",
           "moving-car", "moving-person"]


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "small"
    rows = []
    for v, desc in VARIANTS:
        path = f"artifacts/moving_{v}_{scale}.json"
        if not os.path.exists(path):
            print(f"missing {path}; skipping")
            continue
        rows.append((v, desc, json.load(open(path))))

    d0 = rows[0][2]
    worlds = d0.get("train_worlds_effective", d0["worlds"])
    lines = [
        "# Moving-class temporal evidence "
        f"({scale} scale, {worlds} train world(s) x "
        f"{d0.get('train_windows_per_epoch', '?')} windows/epoch, "
        f"{d0['epochs']} epochs; identical data for all variants)",
        "",
        "Held-out-world (valid) IoU per class; motion across frames is the",
        "only signal separating moving ids 20/22 from static ids 1/6",
        "(see data/lidar_like.py and tests/test_data.py's no-leak test).",
        "",
        "| variant | " + " | ".join(CLASSES) + " | mIoU | moving mean |",
        "|---|" + "---|" * (len(CLASSES) + 2),
    ]
    for v, desc, d in rows:
        iou = d["iou_valid"]
        moving = [iou.get("moving-car", 0.0), iou.get("moving-person", 0.0)]
        cells = [f"{iou.get(c, float('nan')):.3f}" for c in CLASSES]
        lines.append(
            f"| {v} ({desc}) | " + " | ".join(cells)
            + f" | {d['miou_valid']:.3f} | {sum(moving)/2:.3f} |")
    lines += [
        "",
        "Train-split mIoU: " + ", ".join(
            f"{v} {d['miou_train']:.3f}" for v, _, d in rows) + ".",
    ]
    out = "\n".join(lines) + "\n"
    with open(f"artifacts/moving_comparison_{scale}.md", "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
