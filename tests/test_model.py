import jax
import jax.numpy as jnp
import numpy as np
import pytest

from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
from temporal_latticenet_tpu.models import LNNSeq, init_state

TINY_RT = RuntimeConfig(max_points=128, capacity_level0=1024,
                        capacity_decay=1.0, min_capacity=512, sigma=0.6)


def tiny_cfg(**kw):
    base = dict(
        nr_classes=5,
        pointnet_layers=(8, 16),
        pointnet_start_nr_channels=16,
        nr_downsamples=2,
        nr_blocks_down_stage=(1, 1, 1),
        nr_blocks_bottleneck=1,
        nr_blocks_up_stage=(1, 1, 1),
        frames_per_seq=3,
        rnn_modules=("gru", "gru", "aflow", "gru"),
    )
    base.update(kw)
    return ModelConfig(**base)


def _frames(rng, t=3, n=100, p=128):
    out = []
    for i in range(t):
        pos = np.zeros((p, 3), np.float32)
        pos[:n] = rng.normal(size=(n, 3)).astype(np.float32) * 4 + i * 0.3
        val = np.zeros((p, 1), np.float32)
        val[:n] = rng.random((n, 1)).astype(np.float32)
        mask = np.arange(p) < n
        out.append((jnp.asarray(pos), jnp.asarray(val), jnp.asarray(mask)))
    return out


def run_sequence(cfg, rt, frames, seed=0):
    model = LNNSeq(cfg, rt)
    state = init_state(cfg, rt)
    params = model.init(jax.random.PRNGKey(seed), *frames[0], state, final=True)
    params = {"params": params["params"]}
    for f in frames[:-1]:
        _, state, _ = model.apply(params, *f, state, final=False)
    (logp, sv), state, aux = model.apply(params, *frames[-1], state, final=True)
    return logp, sv, state, aux


@pytest.mark.parametrize("modules", [
    ("gru", "gru", "aflow", "gru"),
    ("lstm", "maxpool", "cga", "linear"),
    ("none", "none", "aflow", "none"),
])
def test_forward_shapes_and_finiteness(rng, modules):
    cfg = tiny_cfg(rnn_modules=modules)
    frames = _frames(rng)
    logp, sv, state, aux = run_sequence(cfg, TINY_RT, frames)
    assert logp.shape == (128, 5)
    assert np.isfinite(np.asarray(logp)[:100]).all()
    # log-softmax rows sum to 1 in prob space
    np.testing.assert_allclose(np.exp(np.asarray(logp)[:100]).sum(-1), 1.0,
                               atol=1e-4)
    assert int(state.t) == 3
    assert int(aux["nr_vertices"]) > 1


def test_single_frame_latticenet(rng):
    """sequence_learning=false: plain LatticeNet on one cloud
    (README.md:82; config 1 of BASELINE.json)."""
    cfg = tiny_cfg(sequence_learning=False, frames_per_seq=1,
                   rnn_modules=("gru", "gru", "gru", "gru"))
    frames = _frames(rng, t=1)
    logp, sv, state, aux = run_sequence(cfg, TINY_RT, frames)
    assert np.isfinite(np.asarray(logp)[:100]).all()


def test_vertex_set_grows_across_frames(rng):
    cfg = tiny_cfg()
    rt = TINY_RT
    model = LNNSeq(cfg, rt)
    state = init_state(cfg, rt)
    frames = _frames(rng)
    params = model.init(jax.random.PRNGKey(0), *frames[0], state, final=True)
    counts = []
    for f in frames[:-1]:
        _, state, _ = model.apply(params, *f, state, final=False)
        counts.append(int(state.tables[0].count))
    _, state, _ = model.apply(params, *frames[-1], state, final=True)
    counts.append(int(state.tables[0].count))
    assert counts == sorted(counts)
    assert counts[-1] > counts[0]


def test_hidden_state_affects_final_prediction(rng):
    """Temporal fusion must make the final frame's output depend on earlier
    frames (the recurrence contract, models.py sec 3.3)."""
    cfg = tiny_cfg()
    frames = _frames(rng)
    logp_a, *_ = run_sequence(cfg, TINY_RT, frames)

    # change frame 0 only
    frames_b = list(frames)
    pos, val, mask = frames_b[0]
    frames_b[0] = (pos + 0.5, val, mask)
    model = LNNSeq(cfg, TINY_RT)
    state = init_state(cfg, TINY_RT)
    params = model.init(jax.random.PRNGKey(0), *frames[0], state, final=True)
    for f in frames_b[:-1]:
        _, state, _ = model.apply(params, *f, state, final=False)
    (logp_b, _), _, _ = model.apply(params, *frames_b[-1], state, final=True)

    assert not np.allclose(np.asarray(logp_a)[:100], np.asarray(logp_b)[:100],
                           atol=1e-5)


def test_gradients_flow_through_sequence(rng):
    """BPTT: the loss on the last frame must produce nonzero gradients for
    the fusion parameters touched only via hidden-state carries."""
    cfg = tiny_cfg(rnn_modules=("gru", "none", "none", "none"))
    rt = TINY_RT
    model = LNNSeq(cfg, rt)
    frames = _frames(rng)
    state0 = init_state(cfg, rt)
    params = model.init(jax.random.PRNGKey(0), *frames[0], state0, final=True)

    def loss_fn(p):
        state = init_state(cfg, rt)
        for f in frames[:-1]:
            _, state, _ = model.apply(p, *f, state, final=False)
        (logp, _), _, _ = model.apply(p, *frames[-1], state, final=True)
        return -jnp.mean(logp[:100, 0])

    grads = jax.grad(loss_fn)(params)
    leaves, _ = jax.tree_util.tree_flatten(grads)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert np.isfinite(total) and total > 0

    gru_grads = grads["params"]["point_net_seq"]["fusion_module"]
    gru_total = sum(float(jnp.abs(l).sum())
                    for l in jax.tree_util.tree_leaves(gru_grads))
    assert gru_total > 0


@pytest.mark.parametrize("experiment", [
    "slice_no_deform", "pointnet_no_elevate", "pointnet_no_local_mean",
    "pointnet_no_elevate_no_local_mean", "splat", "attention_pool",
])
def test_experiment_ablations(rng, experiment):
    """The reference's experiment ablation strings (models.py:39) must all
    produce a working forward.  Early fusion stays "none": the splat /
    no-elevate / attention-pool variants change the reduced feature width,
    which the reference's fixed-width early fusion cells cannot take either.
    """
    cfg = tiny_cfg(rnn_modules=("none", "gru", "none", "none"),
                   experiment=experiment)
    frames = _frames(rng, t=2)
    logp, sv, state, aux = run_sequence(cfg, TINY_RT, frames)
    assert np.isfinite(np.asarray(logp)[:100]).all()


def test_invalid_experiment_rejected():
    import pytest as _pytest
    from temporal_latticenet_tpu.config import ModelConfig
    with _pytest.raises(ValueError):
        ModelConfig(experiment="bogus")


def test_all_none_fusion_rejected():
    import pytest as _pytest
    from temporal_latticenet_tpu.config import ModelConfig
    with _pytest.raises(ValueError):
        ModelConfig(rnn_modules=("none", "none", "none", "none"))


def test_unknown_fusion_coerced_to_none():
    """models.py:51-54: unknown rnn_modules strings coerce to "none"."""
    from temporal_latticenet_tpu.config import ModelConfig
    cfg = ModelConfig(rnn_modules=("gru", "whatever", "AFLOW", "GRU"))
    assert cfg.rnn_modules == ("gru", "none", "aflow", "gru")
