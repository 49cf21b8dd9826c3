import numpy as np

from temporal_latticenet_tpu.data import class_meta
from temporal_latticenet_tpu.data.ply import read_ply_vertices
from temporal_latticenet_tpu.utils.label_mngr import LabelMngr, compute_class_weights
from temporal_latticenet_tpu.utils import visualization as vis


def test_label_mngr_from_bundled_data():
    m = LabelMngr(dataset="semantickitti", include_moving=True)
    assert m.nr_classes() == 26
    assert m.label_name(1) == "car"
    assert m.get_idx_unlabeled() == 0
    colors = m.color_from_label_indices(np.array([0, 1, 9]))
    assert colors.shape == (3, 3)
    assert (colors >= 0).all() and (colors <= 1).all()
    # car's official color is BGR (245,150,100) -> distinct RGB
    np.testing.assert_allclose(colors[1], np.array([100, 150, 245]) / 255.0)


def test_label_mngr_from_files(tmp_path):
    class_meta.write_metadata_files(str(tmp_path))
    m = LabelMngr(
        labels_file=str(tmp_path / "semantic-kitti" / "labels.txt"),
        colorscheme_file=str(tmp_path / "semantic-kitti" / "color_scheme.txt"),
        frequency_file=str(tmp_path / "semantic-kitti" / "frequency_26.txt"))
    assert m.nr_classes() == 26
    assert len(m.frequencies) == 26


def test_compute_class_weights():
    freqs = np.array([0.5, 0.01, 0.3])
    w = compute_class_weights(freqs, background_idx=0)
    assert w[0] < 1e-6
    assert w[1] > w[2]  # rarer class weighted higher


def test_export_prediction_cloud(tmp_path):
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(50, 3)).astype(np.float32)
    pred = rng.integers(0, 5, 50)
    gt = rng.integers(0, 5, 50)
    m = LabelMngr(dataset="semantickitti")
    p = tmp_path / "out.ply"
    vis.export_prediction_cloud(str(p), pos, pred, m, gt)
    v = read_ply_vertices(str(p))
    assert len(v) == 50
    np.testing.assert_array_equal(v["label"], pred.astype(np.uint32))
    assert (tmp_path / "out_gt.ply").exists()
    assert (tmp_path / "out_diff.ply").exists()


def test_export_aflow_arrays(tmp_path):
    aux = {"recurrent_fusion_modules_1": {
        "aflow_weights": (np.random.rand(16, 9).astype(np.float32),),
        "aflow_neighbors": (np.zeros((16, 9), np.int32),)}}
    pos = np.random.rand(8, 3).astype(np.float32)
    pv = np.zeros((8, 4), np.int32)
    pv[:, 0] = np.arange(8) % 4 + 1
    keys = vis.export_aflow_arrays(str(tmp_path / "aflow.npz"), aux, pos, pv, 16)
    data = np.load(str(tmp_path / "aflow.npz"))
    assert "avg_position_per_vertex" in data
    assert any("aflow_weights" in k for k in keys)


def test_prepare_cloud_modes():
    from temporal_latticenet_tpu.models.io_utils import Cloud, prepare_cloud
    rng = np.random.default_rng(0)
    c = Cloud(V=rng.normal(size=(10, 3)), C=rng.random((10, 3)),
              I=rng.random((10, 1)), L_gt=rng.integers(0, 5, (10, 1)))
    p, v, t = prepare_cloud(c, "xyz", "reflectance")
    assert p.shape == (10, 3) and v.shape == (10, 1) and t.shape == (10,)
    p2, v2, _ = prepare_cloud(c, "xyz+rgb", "rgb+height")
    assert p2.shape == (10, 6) and v2.shape == (10, 4)
    p3, v3, _ = prepare_cloud(c, "xyz+intensity", "none")
    assert p3.shape == (10, 4) and (v3 == 0).all()


def test_model_summary(capsys):
    import io
    from temporal_latticenet_tpu.models.io_utils import summary
    params = {"params": {"a": {"kernel": np.zeros((3, 4))},
                         "b": {"bias": np.zeros(7)}}}
    buf = io.StringIO()
    total = summary(params, file=buf)
    assert total == 19
    assert "TOTAL: 19" in buf.getvalue()


def test_plot_callback(tmp_path):
    from temporal_latticenet_tpu.train.callbacks import Phase, PlotCallback
    cb = PlotCallback(out_dir=str(tmp_path))
    phase = Phase("train", None, grad=True)
    for i in range(5):
        cb.after_forward_pass(phase=phase, loss=1.0 / (i + 1), lr=0.001)
    cb.epoch_ended(phase=phase)
    assert (tmp_path / "loss.csv").exists()
    assert (tmp_path / "loss.png").exists()


def test_record_plys_renders(tmp_path):
    """End-to-end headless rendering from a synthetic KITTI layout."""
    import record_plys
    rng = np.random.default_rng(0)
    seq_dir = tmp_path / "data" / "sequences" / "08"
    (seq_dir / "velodyne").mkdir(parents=True)
    (seq_dir / "labels").mkdir()
    pred_dir = tmp_path / "preds" / "sequences" / "08" / "predictions"
    pred_dir.mkdir(parents=True)
    for s in range(2):
        pts = rng.normal(size=(200, 4)).astype(np.float32) * 5
        pts.tofile(seq_dir / "velodyne" / f"{s:06d}.bin")
        np.full(200, 10, np.uint32).tofile(seq_dir / "labels" / f"{s:06d}.label")
        rng.integers(0, 20, 200).astype(np.uint32).tofile(
            pred_dir / f"{s:06d}.label")
    record_plys.run(str(tmp_path / "data"), 8, str(tmp_path / "preds"),
                    str(tmp_path / "out"), count=2)
    import os
    assert len(os.listdir(tmp_path / "out")) == 2


def test_evaluate_semantics_pipeline(tmp_path):
    """Predictions written by our eval + this evaluator reproduce a known
    IoU, including the inverse-remap round trip (submission pipeline)."""
    import evaluate_semantics
    from temporal_latticenet_tpu.data import kitti_meta
    rng = np.random.default_rng(0)
    seq_dir = tmp_path / "data" / "sequences" / "08"
    (seq_dir / "labels").mkdir(parents=True)
    pred_dir = tmp_path / "preds" / "sequences" / "08" / "predictions"
    pred_dir.mkdir(parents=True)

    n = 500
    gt_train = rng.choice([1, 9, 13], n)          # car/road/building
    inv = kitti_meta.build_inverse_lut(True)
    gt_raw = inv[gt_train].astype(np.uint32)
    gt_raw.tofile(seq_dir / "labels" / "000000.label")

    pred = gt_train.copy()
    pred[:100] = 9                                # corrupt 100 points to road
    pred.astype(np.uint32).tofile(pred_dir / "000000.label")

    avg, per_class = evaluate_semantics.run(
        str(tmp_path / "data"), str(tmp_path / "preds"), split="valid")
    assert 0.3 < avg < 1.0
    assert per_class[9] < 1.0  # road polluted by false positives

    # inverse remap converts the file to raw ids; evaluating as raw matches
    avg2, _ = evaluate_semantics.run(
        str(tmp_path / "data"), str(tmp_path / "preds"), split="valid",
        remap_inverse=True)
    raw_after = np.fromfile(pred_dir / "000000.label", dtype=np.uint32)
    assert set(np.unique(raw_after)) <= set(inv.tolist())
    avg3, _ = evaluate_semantics.run(
        str(tmp_path / "data"), str(tmp_path / "preds"), split="valid",
        pred_format="raw")
    assert np.isclose(avg, avg3)


def test_submission_validator(tmp_path):
    """--validate (validate_submission.py analog): flags missing, mis-sized
    and extra prediction files; passes on a complete layout."""
    import evaluate_semantics
    rng = np.random.default_rng(0)
    seq_dir = tmp_path / "data" / "sequences" / "08"
    (seq_dir / "velodyne").mkdir(parents=True)
    pred_dir = tmp_path / "preds" / "sequences" / "08" / "predictions"
    pred_dir.mkdir(parents=True)

    counts = [120, 150, 90]
    for s, n in enumerate(counts):
        rng.normal(size=(n, 4)).astype(np.float32).tofile(
            seq_dir / "velodyne" / f"{s:06d}.bin")
    # scan 0 ok; scan 1 mis-sized; scan 2 missing; scan 9 extra
    np.zeros(counts[0], np.uint32).tofile(pred_dir / "000000.label")
    np.zeros(counts[1] - 5, np.uint32).tofile(pred_dir / "000001.label")
    np.zeros(10, np.uint32).tofile(pred_dir / "000009.label")

    rep = evaluate_semantics.validate(str(tmp_path / "data"),
                                      str(tmp_path / "preds"), split="valid")
    assert not rep["ok"]
    assert rep["scans_expected"] == 3
    assert len(rep["missing"]) == 1 and "000002" in rep["missing"][0]
    assert len(rep["mis_sized"]) == 1 and "000001" in rep["mis_sized"][0]
    assert len(rep["extra"]) == 1 and "000009" in rep["extra"][0]

    # repair -> ok
    np.zeros(counts[1], np.uint32).tofile(pred_dir / "000001.label")
    np.zeros(counts[2], np.uint32).tofile(pred_dir / "000002.label")
    (pred_dir / "000009.label").unlink()
    rep = evaluate_semantics.validate(str(tmp_path / "data"),
                                      str(tmp_path / "preds"), split="valid")
    assert rep["ok"]

    # an empty dataset dir must fail, not vacuously pass
    rep = evaluate_semantics.validate(str(tmp_path / "nodata"),
                                      str(tmp_path / "preds"), split="valid")
    assert not rep["ok"] and rep["scans_expected"] == 0

    # labels-dir fallback (fixtures without velodyne) still enumerates scans
    import shutil
    (seq_dir / "labels").mkdir()
    for s, n in enumerate(counts):
        np.zeros(n, np.uint32).tofile(seq_dir / "labels" / f"{s:06d}.label")
    shutil.rmtree(seq_dir / "velodyne")
    rep = evaluate_semantics.validate(str(tmp_path / "data"),
                                      str(tmp_path / "preds"), split="valid")
    assert rep["ok"] and rep["scans_expected"] == 3


def test_autotune_capacities():
    """autotune returns lane-rounded capacities with headroom that admit the
    measured occupancy, and rejects a saturated probe."""
    import numpy as np
    import pytest
    from temporal_latticenet_tpu.utils.autotune import autotune_capacities

    rng = np.random.default_rng(0)
    seqs = []
    for _ in range(2):
        pos = rng.normal(size=(2, 256, 3)).astype(np.float32) * 3
        mask = np.ones((2, 256), bool)
        seqs.append((pos, mask))

    caps = autotune_capacities(seqs, nr_downsamples=2, sigma=0.6,
                               probe_capacity=16384, min_capacity=256)
    assert len(caps) == 3
    assert all(c % 256 == 0 for c in caps)
    assert caps[0] >= caps[1] >= caps[2] >= 256

    with pytest.raises(ValueError):
        autotune_capacities(seqs, nr_downsamples=2, sigma=0.6,
                            probe_capacity=128, min_capacity=128)

    with pytest.raises(ValueError):
        autotune_capacities([], nr_downsamples=2, sigma=0.6)


def test_vertex_overflow_flag():
    """aux.vertex_overflow fires exactly when a level's table saturates."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
    from temporal_latticenet_tpu.models import LNNSeq, init_state

    cfg = ModelConfig(nr_classes=4, pointnet_layers=(4, 8),
                      pointnet_start_nr_channels=8,
                      nr_blocks_down_stage=(1, 1, 1), nr_blocks_bottleneck=1,
                      nr_blocks_up_stage=(1, 1, 1), sequence_learning=False,
                      rnn_modules=("none",) * 4, frames_per_seq=1)
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32) * 5)
    val = jnp.ones((128, 1)); msk = jnp.ones((128,), bool)

    def overflow(cap0):
        rt = RuntimeConfig(max_points=128, capacity_level0=cap0,
                           capacity_decay=1.0, min_capacity=cap0, sigma=0.6)
        model = LNNSeq(cfg, rt)
        v = jax.jit(lambda k: model.init(k, pos, val, msk,
                                         init_state(cfg, rt), final=True)
                    )(jax.random.PRNGKey(0))
        _, _, aux = model.apply({"params": v["params"]}, pos, val, msk,
                                init_state(cfg, rt), final=True)
        return bool(aux["vertex_overflow"])

    assert overflow(128) is True       # 128 points x 4 corners >> 128 slots
    assert overflow(4096) is False
