"""The five driver-defined capability configs (BASELINE.json "configs"),
each exercised end-to-end at tiny scale.  One test per config so the
checklist maps 1:1:

1. single-frame LatticeNet (sequence_learning=false)
2. accumulated-cloud LatticeNet (accumulate_clouds semantics: concat scans,
   run as one cloud)
3. temporal GRU fusion (gru-gru-gru-gru, frames=3)
4. AbstractFlow model (gru-gru-aflow-gru, frames=4) loaded from a
   reference-schema torch state_dict via the converter
5. training run with augmentation + Paris-Lille eval path
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
from temporal_latticenet_tpu.models import LNNSeq, init_state
from temporal_latticenet_tpu.train.engine import make_sequence_forward

RT = RuntimeConfig(max_points=96, capacity_level0=1024, capacity_decay=0.5,
                   min_capacity=256, sigma=0.6)


def _cloud(rng, n=80, t=0.0):
    pos = np.zeros((96, 3), np.float32)
    pos[:n] = rng.normal(size=(n, 3)).astype(np.float32) * 2 + t
    val = np.zeros((96, 1), np.float32)
    val[:n] = rng.random((n, 1))
    msk = np.zeros(96, bool)
    msk[:n] = True
    return jnp.asarray(pos), jnp.asarray(val), jnp.asarray(msk)


def _small(**kw):
    base = dict(nr_classes=6, pointnet_layers=(8, 16),
                pointnet_start_nr_channels=16,
                nr_blocks_down_stage=(1, 1, 1), nr_blocks_bottleneck=1,
                nr_blocks_up_stage=(1, 1, 1))
    base.update(kw)
    return ModelConfig(**base)


def _forward(cfg, frames):
    model = LNNSeq(cfg, RT)
    seq_fwd = make_sequence_forward(model, cfg, RT)
    p = jnp.stack([f[0] for f in frames])
    v = jnp.stack([f[1] for f in frames])
    m = jnp.stack([f[2] for f in frames])
    variables = jax.jit(lambda k: model.init(
        k, p[0], v[0], m[0], init_state(cfg, RT), final=True))(
            jax.random.PRNGKey(0))
    logp, sv, aux = jax.jit(lambda prm: seq_fwd(prm, p, v, m))(
        {"params": variables["params"]})
    assert np.isfinite(np.asarray(logp)[np.asarray(m[-1])]).all()
    return logp


def test_config1_single_frame_latticenet(rng):
    cfg = _small(sequence_learning=False, frames_per_seq=1,
                 rnn_modules=("gru", "gru", "gru", "gru"))
    _forward(cfg, [_cloud(rng)])


def test_config2_accumulated_clouds(rng):
    """Three pose-aligned scans concatenated into ONE cloud, run through the
    single-frame path (the loader-level accumulate semantics,
    kitti_dataloader.py:198-201)."""
    cfg = _small(sequence_learning=False, frames_per_seq=1,
                 rnn_modules=("gru", "gru", "gru", "gru"))
    scans = [_cloud(rng, n=30, t=0.3 * i) for i in range(3)]
    pos = jnp.zeros((96, 3)).at[:90].set(
        jnp.concatenate([s[0][:30] for s in scans]))
    val = jnp.zeros((96, 1)).at[:90].set(
        jnp.concatenate([s[1][:30] for s in scans]))
    msk = jnp.zeros(96, bool).at[:90].set(True)
    _forward(cfg, [(pos, val, msk)])


def test_config3_gru_fusion_frames3(rng):
    cfg = _small(sequence_learning=True, frames_per_seq=3,
                 rnn_modules=("gru", "gru", "gru", "gru"))
    _forward(cfg, [_cloud(rng, t=0.3 * i) for i in range(3)])


def test_config4_aflow_from_torch_checkpoint(rng):
    """Flagship gru-gru-aflow-gru frames=4, with params loaded through the
    reference-schema converter round trip (the .pt blob itself is absent
    from the reference checkout, .MISSING_LARGE_BLOBS)."""
    from temporal_latticenet_tpu.train import torch_convert as tc

    cfg = _small(sequence_learning=True, frames_per_seq=4,
                 rnn_modules=("gru", "gru", "aflow", "gru"))
    model = LNNSeq(cfg, RT)
    frames = [_cloud(rng, t=0.25 * i) for i in range(4)]
    variables = jax.jit(lambda k: model.init(
        k, frames[0][0], frames[0][1], frames[0][2], init_state(cfg, RT),
        final=True))(jax.random.PRNGKey(1))
    native = jax.tree_util.tree_map(np.asarray, variables["params"])

    sd = tc.export_state_dict(native, cfg)          # reference torch schema
    converted, report = tc.convert_state_dict(sd, cfg)
    assert report["unconsumed"] == []

    seq_fwd = make_sequence_forward(model, cfg, RT)
    p = jnp.stack([f[0] for f in frames])
    v = jnp.stack([f[1] for f in frames])
    m = jnp.stack([f[2] for f in frames])
    a, _, _ = jax.jit(lambda prm: seq_fwd(prm, p, v, m))({"params": native})
    b, _, _ = jax.jit(lambda prm: seq_fwd(prm, p, v, m))(
        jax.tree_util.tree_map(jnp.asarray, converted))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_config5_training_with_augmentation_and_parislille_eval(rng):
    """A real optimisation step with the DataTransformer augmentations
    active, plus the Paris-Lille loader's eval path (the reference CLI
    rejects parislille; ours supports it -- PARITY.md)."""
    from temporal_latticenet_tpu.data.transforms import DataTransformer
    from temporal_latticenet_tpu.train import engine

    tr = DataTransformer({
        "random_subsample_percentage": 0.1,
        "random_translation_xyz_magnitude": 1.0,
        "rotation_y_max_angle": 20.0,
        "random_stretch_xyz_magnitude": 0.1,
        "random_mirror_x": True, "random_mirror_z": True,
        "random_rotation_90": True,
    }, split="train")
    base = [rng.normal(size=(60, 3)).astype(np.float32) * 2 for _ in range(2)]
    extras = [[np.ones(60, np.int32), rng.random(60).astype(np.float32)]
              for _ in range(2)]
    clouds, extras = tr.transform([c.copy() for c in base], extras)
    # labels/extras stay row-aligned with the (subsampled) clouds; the
    # random DRAW is sequence-consistent but per-point subsample survivors
    # legitimately differ per frame (DataTransformer.py:94-97 semantics)
    for t in range(2):
        assert clouds[t].shape[0] == extras[t][0].shape[0] > 0

    cfg = _small(sequence_learning=True, frames_per_seq=2,
                 rnn_modules=("gru", "none", "none", "gru"))
    model, state, tx = engine.create_train_state(cfg, RT, 1e-3, 1e-3)
    train_step, eval_step = engine.make_train_step(model, cfg, RT, tx)

    frames = []
    for t in range(2):
        n = clouds[t].shape[0]
        pos = np.zeros((96, 3), np.float32)
        pos[:n] = clouds[t][:96]
        val = np.zeros((96, 1), np.float32)
        val[:n, 0] = extras[t][1][:96]
        lab = np.zeros((96,), np.int32)
        lab[:n] = 1 + (clouds[t][:96, 0] > 0)
        msk = np.zeros(96, bool)
        msk[:n] = True
        frames.append((pos, val, lab, msk))
    batch = engine.SeqBatch(
        jnp.asarray(np.stack([f[0] for f in frames]))[None],
        jnp.asarray(np.stack([f[1] for f in frames]))[None],
        jnp.asarray(np.stack([f[2] for f in frames]))[None],
        jnp.asarray(np.stack([f[3] for f in frames]))[None])
    state2, logp, metrics = train_step(state, batch, 1.0)
    assert np.isfinite(float(metrics["loss"]))

    # Paris-Lille eval path: the 12->10 class remap used on eval
    from temporal_latticenet_tpu.data import parislille_meta
    lut = parislille_meta.twelve_to_ten_lut()
    lab10 = lut[np.arange(12, dtype=np.int32)]
    assert lab10.max() <= 9
