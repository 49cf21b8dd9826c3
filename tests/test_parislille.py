import numpy as np
import pytest

from temporal_latticenet_tpu.data import parislille_meta as meta
from temporal_latticenet_tpu.data.parislille import ParisLille3DDataset
from temporal_latticenet_tpu.data.ply import read_ply_vertices, write_ply_vertices


def test_fine_to_coarse_mappings():
    labels = np.array([202020000, 203000000, 303040202, 303020300, 0, 12345])
    got10 = meta.fine_to_coarse(labels, include_moving=False)
    np.testing.assert_array_equal(got10, [1, 2, 8, 7, 0, 0])
    got12 = meta.fine_to_coarse(labels, include_moving=True)
    np.testing.assert_array_equal(got12, [1, 2, 11, 10, 0, 0])
    lut = meta.twelve_to_ten_lut()
    assert lut[10] == 7 and lut[11] == 8 and lut[3] == 3


def test_ply_roundtrip(tmp_path):
    n = 100
    rng = np.random.default_rng(0)
    fields = {
        "x": rng.normal(size=n).astype(np.float32),
        "y": rng.normal(size=n).astype(np.float32),
        "z": rng.normal(size=n).astype(np.float32),
        "GPS_time": np.sort(rng.random(n) * 20).astype(np.float64),
        "reflectance": rng.random(n).astype(np.float32),
        "class": rng.choice([202020000, 203000000, 304000000], n).astype(np.uint32),
        "x_origin": np.full(n, 1.5, np.float32),
        "y_origin": np.zeros(n, np.float32),
        "z_origin": np.zeros(n, np.float32),
    }
    p = tmp_path / "t.ply"
    write_ply_vertices(str(p), fields)
    v = read_ply_vertices(str(p))
    np.testing.assert_allclose(v["x"], fields["x"])
    np.testing.assert_allclose(v["GPS_time"], fields["GPS_time"])
    np.testing.assert_array_equal(v["class"], fields["class"])


@pytest.fixture
def mini_pl3d(tmp_path):
    rng = np.random.default_rng(1)
    n = 4000
    t = np.sort(rng.random(n) * 30)  # 30 s of driving
    fields = {
        "x": (rng.normal(size=n) * 3 + t).astype(np.float32),
        "y": rng.normal(size=n).astype(np.float32),
        "z": (rng.random(n) * 2).astype(np.float32),
        "x_origin": np.full(n, 5.0, np.float32),
        "y_origin": np.zeros(n, np.float32),
        "z_origin": np.zeros(n, np.float32),
        "GPS_time": t.astype(np.float64),
        "reflectance": rng.random(n).astype(np.float32),
        "class": rng.choice([202020000, 203000000, 303040200, 0], n).astype(np.uint32),
    }
    write_ply_vertices(str(tmp_path / "Lille1.ply"), fields)
    return tmp_path


def _cfg(tmp_path, **kw):
    cfg = dict(dataset_path=str(tmp_path), validation_cloud="Lille1.ply",
               include_moving_classes=False, frames_per_seq=2, cloud_scope=1,
               shuffle_points=False, accumulate_clouds=False, do_pose=True,
               nr_clouds_to_read=-1, nr_clouds_to_skip=0, cap_distance=-1,
               subsample_percentage=0.0, transformer={})
    cfg.update(kw)
    return cfg


def test_parislille_windows_and_caching(mini_pl3d):
    ds = ParisLille3DDataset("valid", _cfg(mini_pl3d), {}, True, max_points=4096)
    assert len(ds) > 2
    frames = ds[2]
    assert len(frames) == 2
    f = frames[-1]
    assert f.n_points > 0
    assert set(np.unique(f.labels[f.mask])) <= {0, 1, 2, 8}
    # labels got the fine->coarse remap (ground=1, building=2, car=8)

    # windows hold ~4 seconds of points (2s interval both sides)
    # reload from cache produces identical windows
    ds2 = ParisLille3DDataset("valid", _cfg(mini_pl3d), {}, True, max_points=4096)
    np.testing.assert_array_equal(ds.start_end_list[0], ds2.start_end_list[0])
    f2 = ds2[2][-1]
    np.testing.assert_allclose(f.positions, f2.positions)


PL_CFG = """
core: {{ loguru_verbosity: 3 }}
train: {{
    dataset_name: "parislille"
    batch_size: 1
    scheduler: "CosineAnnealingWarmRestarts"
    restart_epochs: 3
    lr: 0.001
    weight_decay: 1e-3
    training_epochs: 1
    with_viewer: false
    with_visdom: false
    with_wandb: false
    save_checkpoint: false
    checkpoint_path: "{ckpt}"
    load_checkpoint: false
    load_checkpoint_model: ""
}}
eval: {{
    dataset_name: "parislille"
    with_viewer: false
    save_checkpoint: false
    checkpoint_path: "{ckpt}"
    load_checkpoint_model: ""
    do_write_predictions: false
    output_predictions_path: "{ckpt}"
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
    max_points: 512
    capacity_level0: 512
    capacity_decay: 1.0
    min_capacity: 256
}}
loader_paris_lille: {{
    dataset_path: "{data}"
    validation_cloud: "Lille2.ply"
    include_moving_classes: false
    accumulate_clouds: false
    frames_per_seq: 2
    cloud_scope: 1
    shuffle_points: false
    do_pose: true
    nr_clouds_to_read: -1
    nr_clouds_to_skip: 0
    cap_distance: -1
    subsample_percentage: 0.0
    label_mngr: {{ unlabeled_idx: 0 }}
    transformer: {{ }}
}}
"""


def _write_pl_cloud(path, seed):
    rng = np.random.default_rng(seed)
    n = 3000
    t = np.sort(rng.random(n) * 20)
    fields = {
        "x": (rng.normal(size=n) * 3 + t).astype(np.float32),
        "y": rng.normal(size=n).astype(np.float32),
        "z": (rng.random(n) * 2).astype(np.float32),
        "x_origin": np.full(n, 5.0, np.float32),
        "y_origin": np.zeros(n, np.float32),
        "z_origin": np.zeros(n, np.float32),
        "GPS_time": t.astype(np.float64),
        "reflectance": rng.random(n).astype(np.float32),
        "class": rng.choice([202020000, 203000000, 303040200, 0], n
                            ).astype(np.uint32),
    }
    write_ply_vertices(str(path), fields)


def test_parislille_end_to_end_train_and_eval(tmp_path):
    """BASELINE config 6: a full (tiny) training run + eval through the real
    loop on Paris-Lille-3D data -- train on Lille1, validate on Lille2,
    driven by a parislille .cfg exactly like train_ln.py would.  The
    reference REJECTS Paris-Lille training (train_ln.py:69); here it is a
    first-class path."""
    from temporal_latticenet_tpu.train import loop as tloop

    data = tmp_path / "pl"
    data.mkdir()
    _write_pl_cloud(data / "Lille1.ply", 1)
    _write_pl_cloud(data / "Lille2.ply", 2)
    cfg_path = tmp_path / "pl.cfg"
    cfg_path.write_text(PL_CFG.format(data=str(data), ckpt=str(tmp_path)))

    state = tloop.run_training(str(cfg_path), max_steps=2)
    assert state is not None

    miou, phase = tloop.run_eval(str(cfg_path), split="valid", max_seqs=2)
    assert np.isfinite(miou)
    assert len(phase.scores.iou_per_class()) > 0
