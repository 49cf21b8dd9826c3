"""End-to-end AFlow visualisation export on a synthetic dataset."""

import numpy as np

import visualize_cli
from tests.test_loop import tiny_world  # noqa: F401  (fixture)


def test_visualize_cli_exports_npz(tiny_world, tmp_path):  # noqa: F811
    world, cfg_path = tiny_world
    # the tiny_world config uses gru/none/none/gru; build an aflow variant
    cfg_text = (world / "cfg.cfg").read_text().replace(
        'rnn_modules: ["gru", "none", "none", "gru"]',
        'rnn_modules: ["none", "none", "aflow", "none"]')
    aflow_cfg = tmp_path / "aflow.cfg"
    aflow_cfg.write_text(cfg_text)

    from temporal_latticenet_tpu.config import (cfgParser,
                                                model_config_from_cfg,
                                                nr_classes_from_cfg,
                                                runtime_config_from_cfg)
    from temporal_latticenet_tpu.train import loop as tloop
    from tests.test_loop import _patch_lengths

    parser = cfgParser(str(aflow_cfg))
    cfg = model_config_from_cfg(parser, nr_classes_from_cfg(parser))
    rt = runtime_config_from_cfg(parser)
    datasets = _patch_lengths(tloop.make_datasets(parser, cfg, rt,
                                                  splits=("valid",)))

    out = visualize_cli.run(str(aflow_cfg), None, str(tmp_path / "vis"),
                            seq_index=1, render=True, datasets=datasets)
    data = np.load(str(tmp_path / "vis" / "aflow_frame1.npz"))
    wkeys = [k for k in data.files if "aflow_weights" in k]
    assert wkeys, f"expected aflow weights in {data.files}"
    w = data[wkeys[0]]
    assert w.shape[1] == 9  # one-hop neighborhood + center
    assert "avg_position_per_vertex" in data.files
    assert (tmp_path / "vis" / "aflow_weights_frame1.png").exists()
