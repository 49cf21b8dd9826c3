"""Whole-sequence (birth-tagged) lattice construction vs the streaming path."""

import jax
import jax.numpy as jnp
import numpy as np

from temporal_latticenet_tpu.ops import lattice_ops as lo
from temporal_latticenet_tpu.ops import seq_lattice as sl
from temporal_latticenet_tpu.ops import vertex_table as vt
from temporal_latticenet_tpu.train import engine
from tests.test_model import TINY_RT, tiny_cfg, _frames

SIGMA = 0.6
CAPS = (1024, 1024, 1024)


def _seq(rng, t=3, n=90, p=128):
    pos = np.zeros((t, p, 3), np.float32)
    msk = np.zeros((t, p), bool)
    for i in range(t):
        pos[i, :n] = rng.normal(size=(n, 3)).astype(np.float32) * 4 + i * 0.4
        msk[i, :n] = True
    return jnp.asarray(pos), jnp.asarray(msk)


def test_counts_and_indices_match_streaming(rng):
    pos, msk = _seq(rng)
    seqlat = sl.build_sequence_lattice(pos, msk, SIGMA, CAPS, 2)

    # streaming reference
    t0 = vt.make_table(CAPS[0], 3)
    stream_counts, stream_rows = [], []
    for t in range(3):
        t0, out = lo.distribute(t0, pos[t], msk[t], SIGMA)
        stream_counts.append(int(t0.count))
        stream_rows.append(np.asarray(out.row_vertex))

    np.testing.assert_array_equal(np.asarray(seqlat.levels[0].counts),
                                  stream_counts)
    # indices assigned identically: both orders are (birth, packed)
    for t in range(3):
        np.testing.assert_array_equal(np.asarray(seqlat.row_vertex[t]),
                                      stream_rows[t])

    # birth is monotone along stable indices
    b = np.asarray(seqlat.levels[0].birth)
    c = stream_counts[-1]
    assert (np.diff(b[1:c]) >= 0).all()


def test_frame_neighbor_masking(rng):
    pos, msk = _seq(rng)
    seqlat = sl.build_sequence_lattice(pos, msk, SIGMA, CAPS, 2)
    n0 = seqlat.frame_nbr(0, jnp.int32(0))
    n2 = seqlat.frame_nbr(0, jnp.int32(2))
    f0, f2 = np.asarray(n0.found), np.asarray(n2.found)
    # visibility only grows with t and frame-2 sees strictly more
    assert (f2 | ~f0).all()
    assert f2.sum() > f0.sum()
    # at frame 0, neighbors born later are invisible (the conv must not see
    # them), and a later-born vertex's own center tap is invisible
    nbirth = np.asarray(seqlat.levels[0].nbr_birth)
    assert not f0[nbirth > 0].any()
    b = np.asarray(seqlat.levels[0].birth)
    later = (b >= 1) & (b < 3)
    assert not f0[later, -1].any()


def test_precomputed_forward_matches_streaming(rng):
    """End-to-end equivalence: the precomputed sequence forward must produce
    the streaming path's logits (indices coincide by construction)."""
    cfg = tiny_cfg()
    rt = TINY_RT
    from temporal_latticenet_tpu.models import LNNSeq, init_state
    model = LNNSeq(cfg, rt)
    frames = _frames(rng)
    params = model.init(jax.random.PRNGKey(0), *frames[0],
                        init_state(cfg, rt), final=True)

    fwd_pre = engine.make_sequence_forward(model, cfg, rt, precompute=True)
    fwd_str = engine.make_sequence_forward(model, cfg, rt, precompute=False)

    P = jnp.stack([f[0] for f in frames])
    V = jnp.stack([f[1] for f in frames])
    M = jnp.stack([f[2] for f in frames])

    logp_a, _, _ = fwd_pre(params, P, V, M)
    logp_b, _, _ = fwd_str(params, P, V, M)
    valid = np.asarray(M[-1])
    np.testing.assert_allclose(np.asarray(logp_a)[valid],
                               np.asarray(logp_b)[valid], atol=2e-3)
