"""Multi-world LiDAR training: generalization + the moving-class claim.

VERDICT r2 items 2 & 3.  Two experiment families over ray-cast LiDAR worlds
(data/lidar_like.py) written in real SemanticKITTI on-disk format and driven
through the full loader -> train loop -> metrics -> writer stack:

* generalization (``--variant temporal --moving 0``): train the flagship on
  N train worlds, validate on held-out worlds (fresh world seeds, same
  generator family).
* moving-class (``--moving 1``): worlds contain dynamic actors (moving cars
  id 20, moving pedestrians id 22 of the 26-class setting) plus
  geometrically IDENTICAL static counterparts (ids 1/6).  Motion across
  frames is the only signal separating 1 vs 20 and 6 vs 22, so:
    --variant temporal   flagship gru-gru-aflow-gru    (can separate)
    --variant static     sequence_learning=false       (cannot beat prior)
    --variant accum      accumulate_clouds=true        (sees smear only)
  reproduces the reference paper's central comparison (README.md:13; AFlow,
  /root/reference/seq_lattice/lattice_modules.py:188-339) without the
  dataset blob.

Writes artifacts JSON with train/valid mIoU and per-class IoUs.

Usage:
  python -u scripts/train_lidar.py --variant temporal --moving 1 \
      --epochs 30 --scale small --out artifacts/moving_temporal.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

# lidar_like training ids -> raw SemanticKITTI labels (kitti_meta LUT inverts)
TRAIN_TO_RAW = {9: 40, 13: 50, 16: 71, 18: 80, 1: 10, 6: 30, 20: 252,
                22: 254}

SCALES = {
    # name: (n_beams, n_az, max_points, cap0, min_cap)
    "full": (64, 2048, 131072, 49152, 8192),
    # medium: dense enough azimuth sweep (0.12 m column spacing at 20 m)
    # that pedestrian-sized actors return multiple columns per scan.
    # caps 49152/24576/12288: measured worst-case moving=0 union occupancy
    # is 38.4k/17.0k/7.0k (scripts/occupancy_worlds.py --scale medium; the
    # previous 24576/12288/6144 SATURATED levels 0-1 = silent vertex drops)
    "medium": (64, 1024, 65536, 49152, 12288),
    # small caps 32768/16384/8192: measured worst-case union occupancy of
    # the v3 moving worlds is 27.6k/14.0k/5.9k (coarse-level occupancy
    # shrinks with swept AREA, not point count, so it stays near the
    # full-scale figures; dynamic actors sweep extra union cells)
    "small": (64, 512, 32768, 32768, 8192),
    "smoke": (16, 256, 4096, 4096, 1024),
}

CFG_TEMPLATE = """
core: {{ loguru_verbosity: 3 }}
train: {{
    dataset_name: "semantickitti"
    batch_size: 1
    scheduler: "CosineAnnealingWarmRestarts"
    restart_epochs: {restart_epochs}
    lr: 0.001
    weight_decay: 1e-4
    training_epochs: {epochs}
    with_viewer: false
    with_visdom: false
    with_wandb: false
    save_checkpoint: true
    checkpoint_path: "{ckpt}"
    load_checkpoint: {load_ckpt}
    load_checkpoint_model: "{load_model}"
    start_epoch: {start_epoch}
}}
eval: {{
    dataset_name: "semantickitti"
    with_viewer: false
    save_checkpoint: false
    checkpoint_path: "{ckpt}"
    load_checkpoint_model: ""
    do_write_predictions: false
    output_predictions_path: "{preds}"
}}
model: {{
    positions_mode: "xyz"
    values_mode: "reflectance"
    pointnet_layers: [16, 32, 64]
    pointnet_start_nr_channels: 64
    nr_downsamples: 2
    nr_blocks_down_stage: [2, 2, 2]
    nr_blocks_bottleneck: 3
    nr_blocks_up_stage: [1, 2, 2]
    nr_levels_down_with_normal_resnet: 3
    nr_levels_up_with_normal_resnet: 2
    compression_factor: 1.0
    dropout_last_layer: 0.0
    sequence_learning: {seq_learning}
    rnn_modules: {rnn_modules}
    train_alpha_beta: true
    use_center: true
    experiment: "none"
}}
lattice_gpu: {{ hash_table_capacity: {cap}  nr_sigmas: 1  sigma_0: "0.6 3" }}
runtime: {{
    max_points: {max_points}
    capacity_level0: {cap}
    capacity_decay: 0.5
    min_capacity: {min_cap}
    remat_mode: "{remat}"
}}
loader_semantic_kitti: {{
    dataset_path: "{data}"
    accumulate_clouds: {accum}
    frames_per_seq: {frames}
    cloud_scope: {scope}
    include_moving_classes: true
    sequences: "all"
    shuffle: true
    shuffle_points: false
    do_pose: true
    nr_clouds_to_skip: 0
    nr_clouds_to_read: -1
    measure_sequence_lengths: true
    cap_distance: -1
    min_distance: -1
    normalize: false
    do_overfit: false
    overfit_num_clouds: 100
    debug_loader: false
    seq_same_cloud: false
    label_mngr: {{ unlabeled_idx: 0 }}
    transformer: {{ {aug} }}
}}
"""

# the reference's train-time augmentation (lnn_train_semantic_kitti.cfg:118-
# 133): vertical-axis rotation/mirrors/90-degree spins + xz translation,
# drawn once per sequence window
AUG_BLOCK = """
        random_translation_xz_magnitude: 20.0
        rotation_y_max_angle: 10.0
        random_mirror_x: true
        random_mirror_z: true
        random_rotation_90_degrees_y: true
"""

# KITTI split convention (data/kitti_meta.py): 00-07,09,10 train; 08 valid
TRAIN_SEQS = ["00", "01", "02", "03", "04", "05", "06", "07", "09", "10"]
VALID_SEQS = ["08"]


def write_moving_world(root, seq, n_scans, n_beams, n_az, moving, seed,
                       speed=1.0):
    """One on-disk KITTI sequence from a fresh world; actors move per scan."""
    from temporal_latticenet_tpu.data.lidar_like import (
        _make_actors, _make_world, _raycast_scan, _static_counterparts)
    wrng = np.random.default_rng(seed)
    rng = np.random.default_rng(seed + 1)
    # moving worlds: cars exist ONLY as actors + matched parked
    # counterparts (no background car population with its different
    # spatial distribution -- see lidar_like._make_world)
    world = _make_world(wrng, include_cars=not moving)
    actors = None
    if moving:
        actors = _make_actors(wrng, 16, 12)
        sc, sr, sh, scls = _static_counterparts(wrng, 16, 12,
                                                smear_scans=n_scans)
        world = (np.concatenate([world[0], sc]),
                 np.concatenate([world[1], sr]),
                 np.concatenate([world[2], sh]),
                 np.concatenate([world[3], scls]))

    lut = np.zeros(260, np.uint32)
    for tr, raw in TRAIN_TO_RAW.items():
        lut[tr] = raw

    d = os.path.join(root, "sequences", seq)
    os.makedirs(os.path.join(d, "velodyne"), exist_ok=True)
    os.makedirs(os.path.join(d, "labels"), exist_ok=True)
    eye = "1 0 0 0 0 1 0 0 0 0 1 0"
    with open(os.path.join(d, "calib.txt"), "w") as f:
        f.write(f"P0: {eye}\nTr: {eye}\n")
    with open(os.path.join(d, "poses.txt"), "w") as f:
        for s in range(n_scans):
            f.write(f"1 0 0 {speed * s} 0 1 0 {0.02 * s} 0 0 1 0\n")
    for s in range(n_scans):
        frame_world = world
        if actors is not None:
            ac, ar, ah, acls, av = actors
            frame_world = (np.concatenate([world[0], ac + av * s]),
                           np.concatenate([world[1], ar]),
                           np.concatenate([world[2], ah]),
                           np.concatenate([world[3], acls]))
        pts, lbl = _raycast_scan(frame_world,
                                 np.array([speed * s, 0.02 * s]),
                                 0.01 * s, n_beams, n_az, rng)
        # material-based reflectance (moving ids share their static
        # counterpart's material) -- see lidar_like.material_class; using the
        # raw label here would leak moving-vs-static to a single-frame model
        from temporal_latticenet_tpu.data.lidar_like import material_class
        refl = np.clip(0.1 + 0.08 * (material_class(lbl) % 7)
                       + 0.05 * rng.standard_normal(len(lbl)), 0, 1)
        arr = np.concatenate([pts, refl[:, None].astype(np.float32)], 1)
        arr.astype(np.float32).tofile(
            os.path.join(d, "velodyne", f"{s:06d}.bin"))
        lut[lbl].astype(np.uint32).tofile(
            os.path.join(d, "labels", f"{s:06d}.label"))


CLASS_NAMES = {1: "car", 6: "person", 9: "road", 13: "building",
               16: "trunk", 18: "pole", 20: "moving-car",
               22: "moving-person"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=("temporal", "static", "accum"),
                    default="temporal")
    ap.add_argument("--moving", type=int, default=1)
    ap.add_argument("--worlds", type=int, default=8,
                    help="number of train worlds (sequences)")
    ap.add_argument("--scans", type=int, default=10, help="scans per world")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--scope", type=int, default=1)
    ap.add_argument("--aug", type=int, default=0,
                    help="1 = reference train-time augmentation (AUG_BLOCK)")
    ap.add_argument("--rnn", type=str, default="",
                    help="comma list overriding the temporal variant's rnn "
                         "modules (e.g. gru,gru,gru,gru)")
    ap.add_argument("--frames", type=int, default=4,
                    help="frames per sequence window")
    ap.add_argument("--scale", choices=tuple(SCALES), default="small")
    ap.add_argument("--remat", choices=("full", "selective", "none"),
                    default="full", help="BPTT remat mode (runtime section)")
    ap.add_argument("--root", type=str, default="")
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the newest per-epoch checkpoint in "
                         "this run's checkpoint dir (transient TPU-tunnel "
                         "failures otherwise lose the whole run)")
    ap.add_argument("--fresh-data", action="store_true",
                    help="regenerate the on-disk worlds even if present")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    beams, n_az, max_points, cap0, min_cap = SCALES[args.scale]
    if args.variant == "accum":
        # the accumulated cloud holds the whole 4-scan window; without the
        # larger budget the loader's drop-oldest would silently cut the
        # baseline down to ~1 scan.  Union occupancy is unchanged (same
        # union of scans), so capacities stay.
        max_points *= 4
    root = args.root or f"/tmp/train_lidar_{args.scale}_m{args.moving}"
    data = os.path.join(root, "data")
    stamp = os.path.join(data, "GENERATED.json")
    want = {"worlds": args.worlds, "scans": args.scans, "beams": beams,
            "n_az": n_az, "moving": args.moving,
            "refl": "material-v2", "geom": "actor-only-cars-v3"}
    if args.fresh_data or not (os.path.exists(stamp)
                               and json.load(open(stamp)) == want):
        t0 = time.perf_counter()
        for i, seq in enumerate(TRAIN_SEQS[:args.worlds] + VALID_SEQS):
            write_moving_world(data, seq, args.scans, beams, n_az,
                               bool(args.moving), seed=1000 + int(seq))
        os.makedirs(data, exist_ok=True)
        json.dump(want, open(stamp, "w"))
        print(f"wrote {args.worlds}+1 worlds in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)

    ckpt_dir = os.path.join(root, f"ckpt_{args.variant}")
    preds = os.path.join(root, "preds")
    os.makedirs(ckpt_dir, exist_ok=True)

    load_ckpt, load_model, start_epoch = "false", "", 0
    if args.resume:
        import re
        done = sorted(
            (int(m.group(1)), f) for f in os.listdir(ckpt_dir)
            if (m := re.search(r"_epoch(\d+)\.ckpt$", f)))
        if done:
            last_epoch, load_model = done[-1]
            load_ckpt, start_epoch = "true", last_epoch + 1
            print(f"resuming from epoch {last_epoch} ({load_model})",
                  flush=True)

    # accum keeps sequence_learning TRUE: the loader only reads a
    # frames_per_seq window when sequence_learning is on (reference
    # semantics, kitti_dataloader.py:60) and accumulate_clouds collapses it
    # to ONE concatenated frame -- with sequence_learning false the
    # "accumulated" cloud is silently a single scan (a second static run).
    # The rnn modules stay flagship so parameters match the temporal
    # variant; with one frame they carry no temporal information.
    seq_learning = "false" if args.variant == "static" else "true"
    accum = "true" if args.variant == "accum" else "false"
    if args.variant in ("temporal", "accum"):
        mods = (args.rnn.split(",") if args.rnn
                else ["gru", "gru", "aflow", "gru"])
    else:
        mods = ["none"] * 4
    rnn = "[" + ", ".join(f'"{m.strip()}"' for m in mods) + "]"
    cfg_path = os.path.join(root, f"cfg_{args.variant}.cfg")
    with open(cfg_path, "w") as f:
        f.write(CFG_TEMPLATE.format(
            epochs=args.epochs, restart_epochs=max(args.epochs // 3, 5),
            cap=cap0, ckpt=ckpt_dir, preds=preds, data=data,
            max_points=max_points, min_cap=min_cap, scope=args.scope,
            aug=AUG_BLOCK if args.aug else "",
            frames=args.frames if args.variant != "static" else 1,
            seq_learning=seq_learning, rnn_modules=rnn, accum=accum,
            remat=args.remat, load_ckpt=load_ckpt, load_model=load_model,
            start_epoch=start_epoch))

    from temporal_latticenet_tpu.train import loop as tloop

    t0 = time.perf_counter()
    tloop.run_training(cfg_path)
    train_s = time.perf_counter() - t0
    print(f"training wall {train_s:.0f}s", flush=True)

    ckpts = sorted((os.path.join(ckpt_dir, f) for f in os.listdir(ckpt_dir)
                    if f.endswith(".ckpt")), key=os.path.getmtime)
    latest = ckpts[-1]
    print("using checkpoint:", latest, flush=True)

    results = {"variant": args.variant, "moving": args.moving,
               "worlds": args.worlds, "scans": args.scans,
               "train_windows_per_epoch": args.worlds * args.scans,
               "epochs": args.epochs, "scale": args.scale,
               "scope": args.scope, "train_wall_s": train_s,
               "checkpoint": latest}
    for split in ("train", "valid"):
        miou, phase = tloop.run_eval(cfg_path, split=split,
                                     checkpoint_path=latest)
        per_class = phase.scores.iou_per_class()
        results[f"miou_{split}"] = float(miou)
        results[f"iou_{split}"] = {
            CLASS_NAMES.get(int(k), str(k)): float(v)
            for k, v in per_class.items()}
        print(f"{split} mIoU {miou:.4f}  per-class "
              f"{results[f'iou_{split}']}", flush=True)

    out = args.out or os.path.join(
        "artifacts", f"lidar_{args.variant}_m{args.moving}_{args.scale}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
