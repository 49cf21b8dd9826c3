"""Trimmed-frame capacities (RuntimeConfig.trim_capacity_level0).

The whole-sequence path may run the non-final frames on [0, trim_cap) row
prefixes (ops/seq_lattice.trim_sequence_lattice): birth-sorted stable
indices make the prefix complete for frames 0..T-2, so results must match
the full-capacity path up to f32 reduction order, and undersized trim caps
must raise aux["trim_overflow"] instead of failing silently.
"""

import jax
import jax.numpy as jnp
import numpy as np

from temporal_latticenet_tpu.config import RuntimeConfig
from temporal_latticenet_tpu.train import engine
from tests.test_model import tiny_cfg


def _seq(rng, t=3, n=100, p=128):
    pos = np.zeros((t, p, 3), np.float32)
    val = np.zeros((t, p, 1), np.float32)
    msk = np.zeros((t, p), bool)
    for ti in range(t):
        # dense cluster: sparse data blows up the COARSE occupancy (the
        # all-corner splat makes level 1 larger than level 0), which would
        # leave no trim headroom at the tiny capacities
        pos[ti, :n] = rng.normal(size=(n, 3)).astype(np.float32) * 1.5 + ti * 0.3
        val[ti, :n] = rng.random((n, 1))
        msk[ti, :n] = True
    return jnp.asarray(pos), jnp.asarray(val), jnp.asarray(msk)


def _rt(**kw):
    base = dict(max_points=128, capacity_level0=1024, capacity_decay=1.0,
                min_capacity=512, sigma=0.6)
    base.update(kw)
    return RuntimeConfig(**base)


def _forward(cfg, rt, params, seq):
    model = engine.LNNSeq(cfg, rt)
    fwd = jax.jit(engine.make_sequence_forward(model, cfg, rt))
    return fwd(params, *seq)


def test_trim_matches_full_forward(rng):
    cfg = tiny_cfg()
    _, state, _ = engine.create_train_state(cfg, _rt(), 1e-3, 0.0)
    seq = _seq(rng)

    logp_full, sv_full, aux_full = _forward(cfg, _rt(), state.params, seq)
    logp_trim, sv_trim, aux_trim = _forward(
        cfg, _rt(trim_capacity_level0=640), state.params, seq)

    assert not bool(aux_trim["trim_overflow"])
    np.testing.assert_allclose(np.asarray(sv_trim), np.asarray(sv_full),
                               rtol=2e-5, atol=2e-5)


def test_trim_overflow_flag(rng):
    # trim caps far below frame-(T-2) occupancy: flagged, also OR-ed into
    # vertex_overflow so existing surfacing catches it
    cfg = tiny_cfg()
    rt = _rt(trim_capacity_level0=64, min_capacity=64)
    _, state, _ = engine.create_train_state(cfg, rt, 1e-3, 0.0)
    _, _, aux = _forward(cfg, rt, state.params, _seq(rng))
    assert bool(aux["trim_overflow"])
    assert bool(aux["vertex_overflow"])


def test_final_trim_matches_full_forward(rng):
    # the FINAL frame on a [0, final_cap) prefix: same birth-sorted-prefix
    # argument with counts[T-1]; exact up to f32 reduction order
    cfg = tiny_cfg()
    _, state, _ = engine.create_train_state(cfg, _rt(), 1e-3, 0.0)
    seq = _seq(rng)

    logp_full, sv_full, _ = _forward(cfg, _rt(), state.params, seq)
    for kw in (dict(final_capacity_level0=768),
               dict(trim_capacity_level0=640, final_capacity_level0=768),
               # final trim below the non-final trim exercises the h slice
               dict(trim_capacity_level0=768, final_capacity_level0=704)):
        logp_t, sv_t, aux_t = _forward(cfg, _rt(**kw), state.params, seq)
        assert not bool(aux_t["trim_overflow"]), kw
        np.testing.assert_allclose(np.asarray(sv_t), np.asarray(sv_full),
                                   rtol=2e-5, atol=2e-5, err_msg=str(kw))


def test_final_trim_overflow_flag(rng):
    cfg = tiny_cfg()
    rt = _rt(final_capacity_level0=64, min_capacity=64)
    _, state, _ = engine.create_train_state(cfg, rt, 1e-3, 0.0)
    _, _, aux = _forward(cfg, rt, state.params, _seq(rng))
    assert bool(aux["trim_overflow"])
    assert bool(aux["vertex_overflow"])


def test_trim_grad_matches(rng):
    # the BPTT backward through the trimmed scan must agree with the
    # full-capacity backward (same activations, fewer padded rows)
    cfg = tiny_cfg(rnn_modules=("gru", "gru", "none", "none"))
    _, state, _ = engine.create_train_state(cfg, _rt(), 1e-3, 0.0)
    seq = _seq(rng)

    def loss(rt):
        model = engine.LNNSeq(cfg, rt)
        fwd = engine.make_sequence_forward(model, cfg, rt)

        def f(params):
            logp, sv, _ = fwd(params, *seq)
            return jnp.sum(sv ** 2)
        return jax.jit(jax.grad(f))(state.params)

    g_full = loss(_rt())
    g_trim = loss(_rt(trim_capacity_level0=640))
    flat_f = jax.tree_util.tree_leaves(g_full)
    flat_t = jax.tree_util.tree_leaves(g_trim)
    for a, b in zip(flat_f, flat_t):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)
