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
