"""Temporal sanity fixtures, promoted from the reference's manual debugging
knobs (SURVEY.md 4: ``seq_same_cloud`` isolates hidden-state plumbing from
motion; ``debug_loader`` colors frames for pose checks), plus a golden
regression anchor."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_model import TINY_RT, tiny_cfg, _frames, run_sequence
from temporal_latticenet_tpu.models import LNNSeq, init_state


def test_seq_same_cloud_keeps_vertex_set_constant(rng):
    """Feeding the SAME cloud as every frame must not grow the lattice after
    frame 0, and fusion must still evolve the prediction."""
    cfg = tiny_cfg()
    rt = TINY_RT
    model = LNNSeq(cfg, rt)
    f = _frames(rng, t=1)[0]
    state = init_state(cfg, rt)
    params = model.init(jax.random.PRNGKey(0), *f, state, final=True)

    counts = []
    for t in range(3):
        final = t == 2
        ret, state, _ = model.apply(params, *f, state, final=final)
        counts.append(int(state.tables[0].count))
    assert counts[0] == counts[1] == counts[2]

    # a single-frame prediction differs from the 3x-same-cloud one (hidden
    # state accumulates through the GRUs)
    logp_single, *_ = run_sequence(cfg, rt, [f])
    logp_seq = ret[0]
    assert not np.allclose(np.asarray(logp_single)[:100],
                           np.asarray(logp_seq)[:100], atol=1e-5)


def test_maxpool_same_cloud_is_single_frame_fixed_point(rng):
    """With maxpool fusion and an identical cloud, max(h, lv) == lv for the
    middle/late sites on the second frame IF features repeat -- they do for
    maxpool-everywhere since frame 0 is the identity and the hidden equals
    the frame-0 features."""
    cfg = tiny_cfg(rnn_modules=("none", "maxpool", "maxpool", "maxpool"))
    rt = TINY_RT
    f = _frames(rng, t=1)[0]
    logp_1, *_ = run_sequence(cfg, rt, [f])
    logp_3, *_ = run_sequence(cfg, rt, [f, f, f])
    np.testing.assert_allclose(np.asarray(logp_1)[:100],
                               np.asarray(logp_3)[:100], atol=1e-4)


def test_golden_regression(rng):
    """Anchor against silent numeric drift: fixed seed, fixed tiny config,
    CPU backend.  If an INTENTIONAL change moves these values, update them
    and say why in the commit message."""
    cfg = tiny_cfg(compute_dtype="float32")
    frames = _frames(np.random.default_rng(1234), t=3)
    logp, sv, state, aux = run_sequence(cfg, TINY_RT, frames, seed=7)
    arr = np.asarray(logp)[:100]

    assert int(aux["nr_vertices"]) == int(state.tables[0].count)

    # Pinned on the CPU backend (tests/conftest.py forces it).  Tolerances
    # allow fused-op reassociation across jax versions but fail on any
    # model-level perturbation (e.g. a fusion constant changing).
    np.testing.assert_allclose(float(arr.mean()), -1.6380532, atol=1e-4)
    np.testing.assert_allclose(float(arr.std()), 0.2601782, atol=1e-4)
    golden_head = np.array(
        [-1.4827988, -1.5886852, -1.6179386, -1.9130685, -1.501163,
         -1.2632387, -1.4868305, -1.6143117, -2.2311301, -1.6888039,
         -1.1148212, -1.6098788], dtype=np.float32)
    np.testing.assert_allclose(arr.reshape(-1)[:12], golden_head, atol=2e-4)
