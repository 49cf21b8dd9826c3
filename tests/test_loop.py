"""End-to-end host-loop smoke test: a real config file, a synthetic on-disk
SemanticKITTI dataset, a few optimisation steps and one eval pass -- the
jit-era analog of the reference's do_overfit fixture (SURVEY.md 4)."""

import os

import numpy as np
import pytest

from temporal_latticenet_tpu.train import loop as tloop

CFG_TEMPLATE = """
core: {{ loguru_verbosity: 3 }}
train: {{
    dataset_name: "semantickitti"
    batch_size: 1
    scheduler: "CosineAnnealingWarmRestarts"
    restart_epochs: 3
    lr: 0.001
    weight_decay: 1e-3
    training_epochs: 1
    with_viewer: false
    with_visdom: false
    with_wandb: false
    save_checkpoint: true
    checkpoint_path: "{ckpt}"
    load_checkpoint: false
    load_checkpoint_model: ""
}}
eval: {{
    dataset_name: "semantickitti"
    with_viewer: false
    save_checkpoint: false
    checkpoint_path: "{ckpt}"
    load_checkpoint_model: ""
    do_write_predictions: true
    output_predictions_path: "{preds}"
}}
model: {{
    positions_mode: "xyz"
    values_mode: "reflectance"
    pointnet_layers: [8, 16]
    pointnet_start_nr_channels: 16
    nr_downsamples: 2
    nr_blocks_down_stage: [1, 1, 1]
    nr_blocks_bottleneck: 1
    nr_blocks_up_stage: [1, 1, 1]
    nr_levels_down_with_normal_resnet: 3
    nr_levels_up_with_normal_resnet: 3
    compression_factor: 1.0
    dropout_last_layer: 0.0
    sequence_learning: true
    rnn_modules: ["gru", "none", "none", "gru"]
    train_alpha_beta: true
    use_center: true
    experiment: "none"
}}
lattice_gpu: {{ hash_table_capacity: 512  nr_sigmas: 1  sigma_0: "0.6 3" }}
runtime: {{
    max_points: 64
    capacity_level0: 512
    capacity_decay: 1.0
    min_capacity: 256
}}
loader_semantic_kitti: {{
    dataset_path: "{data}"
    accumulate_clouds: false
    frames_per_seq: 2
    cloud_scope: 1
    include_moving_classes: true
    sequences: "all"
    shuffle: false
    shuffle_points: false
    do_pose: true
    nr_clouds_to_skip: 0
    nr_clouds_to_read: 3
    cap_distance: -1
    min_distance: -1
    normalize: false
    do_overfit: false
    overfit_num_clouds: 100
    debug_loader: false
    seq_same_cloud: false
    label_mngr: {{ unlabeled_idx: 0 }}
    transformer: {{ }}
}}
"""


@pytest.fixture
def tiny_world(tmp_path):
    """On-disk mini dataset + config file."""
    rng = np.random.default_rng(11)
    n_scans, n_pts = 6, 40
    for seq in ["00", "08", "11"]:
        seq_dir = tmp_path / "data" / "sequences" / seq
        (seq_dir / "velodyne").mkdir(parents=True)
        (seq_dir / "labels").mkdir()
        with open(seq_dir / "calib.txt", "w") as f:
            eye = "1 0 0 0 0 1 0 0 0 0 1 0"
            for k in ["P0", "Tr"]:
                f.write(f"{k}: {eye}\n")
        with open(seq_dir / "poses.txt", "w") as f:
            for s in range(n_scans):
                f.write(f"1 0 0 {0.1*s} 0 1 0 0 0 0 1 0\n")
        for s in range(n_scans):
            pts = rng.normal(size=(n_pts, 3)).astype(np.float32) * 3
            refl = rng.random(n_pts).astype(np.float32)
            np.concatenate([pts, refl[:, None]], 1).astype(np.float32).tofile(
                seq_dir / "velodyne" / f"{s:06d}.bin")
            lab = rng.choice([10, 40, 48], n_pts).astype(np.uint32)
            lab.tofile(seq_dir / "labels" / f"{s:06d}.label")

    cfg_path = tmp_path / "cfg.cfg"
    cfg_path.write_text(CFG_TEMPLATE.format(
        ckpt=str(tmp_path / "ckpts") + "/",
        preds=str(tmp_path / "preds"),
        data=str(tmp_path / "data")))
    return tmp_path, str(cfg_path)


def _patch_lengths(datasets, n=6):
    for ds in datasets.values():
        ds.dataset_lengths = [n]
        ds.dataset_size = min(ds.dataset_size, 3)
    return datasets


def test_run_training_and_eval(tiny_world):
    tmp_path, cfg_path = tiny_world

    from temporal_latticenet_tpu.config import (cfgParser,
                                                model_config_from_cfg,
                                                nr_classes_from_cfg,
                                                runtime_config_from_cfg)
    parser = cfgParser(cfg_path)
    cfg = model_config_from_cfg(parser, nr_classes_from_cfg(parser))
    rt = runtime_config_from_cfg(parser)
    assert cfg.nr_classes == 26 and rt.max_points == 64

    datasets = _patch_lengths(tloop.make_datasets(parser, cfg, rt))
    state = tloop.run_training(cfg_path, max_steps=4, datasets=datasets)
    assert state is not None
    ckpts = os.listdir(tmp_path / "ckpts")
    assert any(c.endswith(".ckpt") for c in ckpts)
    assert any(c.endswith(".csv") for c in ckpts)

    # eval on the same tiny world, writing predictions
    eval_sets = _patch_lengths(tloop.make_datasets(parser, cfg, rt,
                                                   splits=("valid",)))
    miou, phase = tloop.run_eval(cfg_path, split="valid", max_seqs=2,
                                 datasets=eval_sets)
    assert 0.0 <= miou <= 1.0
    preds_root = tmp_path / "preds" / "sequences"
    label_files = list(preds_root.rglob("*.label"))
    assert label_files, "prediction .label files must be written"
    raw = np.fromfile(label_files[0], dtype=np.uint32)
    assert raw.shape[0] == 40


def test_resume_from_epoch_checkpoint(tiny_world):
    """train.start_epoch + load_checkpoint resumes a crashed run: epoch
    numbering continues (checkpoint names, cosine schedule) and the
    optimiser step counter carries over instead of restarting."""
    tmp_path, cfg_path = tiny_world

    from temporal_latticenet_tpu.config import (cfgParser,
                                                model_config_from_cfg,
                                                nr_classes_from_cfg,
                                                runtime_config_from_cfg)
    parser = cfgParser(cfg_path)
    cfg = model_config_from_cfg(parser, nr_classes_from_cfg(parser))
    rt = runtime_config_from_cfg(parser)

    datasets = _patch_lengths(tloop.make_datasets(parser, cfg, rt))
    state0 = tloop.run_training(cfg_path, datasets=datasets)
    epoch0 = [c for c in os.listdir(tmp_path / "ckpts")
              if c.endswith("_epoch0.ckpt")]
    assert len(epoch0) == 1

    text = open(cfg_path).read()
    text = text.replace("training_epochs: 1", "training_epochs: 2")
    text = text.replace("load_checkpoint: false", "load_checkpoint: true")
    text = text.replace('load_checkpoint_model: ""\n}',
                        f'load_checkpoint_model: "{epoch0[0]}"\n'
                        "    start_epoch: 1\n}", 1)
    resume_path = tmp_path / "cfg_resume.cfg"
    resume_path.write_text(text)

    state1 = tloop.run_training(str(resume_path), datasets=datasets)
    names = os.listdir(tmp_path / "ckpts")
    assert any(c.endswith("_epoch1.ckpt") for c in names), names
    # exactly one extra epoch ran, from the restored step counter onward
    assert int(state1.step) == 2 * int(state0.step)
    from temporal_latticenet_tpu.config import (cfgParser,
                                                model_config_from_cfg,
                                                nr_classes_from_cfg,
                                                runtime_config_from_cfg)
    from temporal_latticenet_tpu.train import checkpoint as ckpt
    from temporal_latticenet_tpu.train import engine
    import jax

    _, cfg_path = tiny_world
    parser = cfgParser(cfg_path)
    cfg = model_config_from_cfg(parser, nr_classes_from_cfg(parser))
    rt = runtime_config_from_cfg(parser)
    model, state, tx = engine.create_train_state(cfg, rt, 1e-3, 1e-3)

    path = str(tmp_path / "x.ckpt")
    ckpt.save(path, state.params, state.opt_state, 7)
    model2, state2, _ = engine.create_train_state(cfg, rt, 1e-3, 1e-3, seed=1)
    restored = ckpt.load(path, state2.params, state2.opt_state)
    assert restored["step"] == 7
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_run_training_accumulate_clouds(tiny_world):
    """accumulate_clouds=true: the window concatenates into one cloud and
    trains as a single-frame sequence (BASELINE.json config 2)."""
    tmp_path, cfg_path = tiny_world
    text = open(cfg_path).read().replace("accumulate_clouds: false",
                                         "accumulate_clouds: true")
    text = text.replace("max_points: 64", "max_points: 128")
    acc_path = tmp_path / "cfg_accum.cfg"
    acc_path.write_text(text)

    from temporal_latticenet_tpu.config import (cfgParser,
                                                model_config_from_cfg,
                                                nr_classes_from_cfg,
                                                runtime_config_from_cfg)
    parser = cfgParser(str(acc_path))
    cfg = model_config_from_cfg(parser, nr_classes_from_cfg(parser))
    rt = runtime_config_from_cfg(parser)
    datasets = _patch_lengths(tloop.make_datasets(parser, cfg, rt))
    frames = datasets["train"][1]
    assert len(frames) == 1 and frames[0].n_points == 80  # 2 scans x 40 pts

    state = tloop.run_training(str(acc_path), max_steps=2, datasets=datasets)
    assert state is not None


def test_accumulate_eval_trims_to_last_scan(tiny_world):
    """VERDICT r1 item 4: in ACCUM mode the written .label file contains
    exactly the LAST scan's points (test_ln.py:221), the last scan survives
    a max_points overflow (oldest points are dropped first), and scoring
    still sees every accumulated point."""
    tmp_path, cfg_path = tiny_world
    cfg_text = open(cfg_path).read()
    cfg_text = cfg_text.replace("accumulate_clouds: false",
                                "accumulate_clouds: true")
    # 2 scans x 40 pts = 80 > max_points 64 -> oldest 16 points dropped
    acc_path = str(tmp_path / "cfg_accum.cfg")
    open(acc_path, "w").write(cfg_text)

    from temporal_latticenet_tpu.config import (cfgParser,
                                                model_config_from_cfg,
                                                nr_classes_from_cfg,
                                                runtime_config_from_cfg)
    parser = cfgParser(acc_path)
    cfg = model_config_from_cfg(parser, nr_classes_from_cfg(parser))
    rt = runtime_config_from_cfg(parser)

    eval_sets = _patch_lengths(tloop.make_datasets(parser, cfg, rt,
                                                   splits=("valid",)))
    ds = eval_sets["valid"]
    frames = ds[0]
    assert len(frames) == 1, "accumulate collapses the sequence to one frame"
    fb = frames[0]
    assert fb.n_points == 64 and fb.last_n == 40
    # the tail of the accumulated cloud IS the last scan: labels of the tail
    # must match the last scan's labels read straight from disk
    import pathlib
    seq_dir = pathlib.Path(fb.path).parent.parent
    raw_lab = np.fromfile(fb.path.replace("velodyne", "labels")
                          .replace(".bin", ".label"), dtype=np.uint32)
    from temporal_latticenet_tpu.data.kitti_meta import LEARNING_MAP_26
    mapped = np.asarray([LEARNING_MAP_26[l] for l in (raw_lab & 0xFFFF)])
    np.testing.assert_array_equal(fb.labels[64 - 40:64], mapped)

    miou, phase = tloop.run_eval(acc_path, split="valid", max_seqs=1,
                                 datasets=eval_sets)
    label_files = list((tmp_path / "preds" / "sequences").rglob("*.label"))
    assert label_files, "prediction .label files must be written"
    raw = np.fromfile(label_files[0], dtype=np.uint32)
    assert raw.shape[0] == 40, raw.shape


def test_run_training_batch_data_parallel(tiny_world):
    """batch_size > 1 shards whole sequences across the dp mesh inside the
    real training loop (the CLI path, not just the engine test)."""
    tmp_path, cfg_path = tiny_world
    text = open(cfg_path).read().replace("batch_size: 1", "batch_size: 2")
    bp = tmp_path / "cfg_dp.cfg"
    bp.write_text(text)

    from temporal_latticenet_tpu.config import (cfgParser,
                                                model_config_from_cfg,
                                                nr_classes_from_cfg,
                                                runtime_config_from_cfg)
    parser = cfgParser(str(bp))
    cfg = model_config_from_cfg(parser, nr_classes_from_cfg(parser))
    rt = runtime_config_from_cfg(parser)
    datasets = tloop.make_datasets(parser, cfg, rt)

    # 3 train sequences at group size 2 -> one optimiser step per epoch
    # (remainder dropped); max_steps counts train+valid iterations
    state = tloop.run_training(str(bp), max_steps=2, datasets=datasets)
    assert int(state.step) >= 1
    import numpy as np
    for leaf in __import__("jax").tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_run_eval_reports_submission_validation(tiny_world, capsys):
    """run_eval on a FULL split (max_seqs=None) with prediction writing
    runs the submission-completeness validator (the reference pipeline's
    validate_submission.py step) and prints its report -- informative,
    never fatal (window clamping can leave early scans without files)."""
    tmp_path, cfg_path = tiny_world
    from temporal_latticenet_tpu.config import (cfgParser,
                                                model_config_from_cfg,
                                                nr_classes_from_cfg,
                                                runtime_config_from_cfg)
    parser = cfgParser(cfg_path)
    cfg = model_config_from_cfg(parser, nr_classes_from_cfg(parser))
    rt = runtime_config_from_cfg(parser)
    eval_sets = _patch_lengths(tloop.make_datasets(parser, cfg, rt,
                                                   splits=("valid",)))
    miou, phase = tloop.run_eval(cfg_path, split="valid", datasets=eval_sets)
    out = capsys.readouterr().out
    assert "validation" in out.lower()
