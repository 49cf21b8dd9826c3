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


def test_union_mean_matches_scatter_reference(rng):
    """The in-union scan-based local mean (r2 optimisation) must match the
    straightforward per-frame segment_sum/gather computation, and the union
    outputs must be unchanged from _union_with_birth."""
    from temporal_latticenet_tpu.ops import seq_lattice as sl
    from temporal_latticenet_tpu.ops.vertex_table import SENTINEL, pack_keys
    from temporal_latticenet_tpu.ops import permutohedral as pm

    T, P, cap = 3, 64, 512
    pos = rng.normal(size=(T, P, 3)).astype(np.float32) * 2.0
    mask = rng.random((T, P)) > 0.2
    lat = sl.build_sequence_lattice(jnp.asarray(pos), jnp.asarray(mask),
                                    0.6, (cap, 256, 128), 2)

    # reference recomputation of rel + counts per frame
    pos_rows = np.repeat(pos, 4, axis=1)
    for t in range(T):
        rv = np.asarray(lat.row_vertex[t])
        valid = np.asarray(lat.row_valid[t])
        sums = np.zeros((cap, 3)); cnts = np.zeros(cap)
        for r in np.nonzero(valid)[0]:
            sums[rv[r]] += pos_rows[t, r]
            cnts[rv[r]] += 1
        mean = sums / np.maximum(cnts, 1)[:, None]
        want_rel = (pos_rows[t] - mean[rv]) * valid[:, None]
        np.testing.assert_allclose(np.asarray(lat.row_rel_pos[t]), want_rel,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(lat.nr_points[t]), cnts,
                                   atol=0)

    # union outputs identical to the plain union
    elev = pm.elevate(jnp.asarray(pos.reshape(T * P, 3)), 0.6)
    keys, _ = pm.find_enclosing_simplex(elev)
    rvalid = np.repeat(mask, 4, axis=1).reshape(-1)
    flat = jnp.where(jnp.asarray(rvalid)[:, None],
                     keys.reshape(-1, 3), SENTINEL)
    packed = pack_keys(flat)
    order = jnp.arange(T * P * 4, dtype=jnp.int32)
    p0, b0, ri0, c0 = sl._union_with_birth(packed, order, cap, T)
    p1, b1, ri1, c1, _, _, _ = sl._union_with_birth_and_mean(
        packed, jnp.asarray(pos_rows.reshape(-1, 3)), cap, T)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(ri0), np.asarray(ri1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


def test_incremental_streaming_matches_full_streaming(rng):
    """The incremental serving path (carried neighbor tables + links;
    host-chosen full build on frame 0) must reproduce the plain streaming
    path's logits exactly, and its overflow flag must fire when a frame's
    growth exceeds max_new."""
    from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
    from temporal_latticenet_tpu.models import LNNSeq, init_state
    from temporal_latticenet_tpu.train.engine import (
        make_streaming_inference, make_streaming_inference_incremental)

    cfg = ModelConfig(nr_classes=5, pointnet_layers=(8, 16),
                      pointnet_start_nr_channels=16,
                      nr_blocks_down_stage=(1, 1, 1), nr_blocks_bottleneck=1,
                      nr_blocks_up_stage=(1, 1, 1),
                      rnn_modules=("gru", "gru", "aflow", "gru"),
                      frames_per_seq=3)
    rt = RuntimeConfig(max_points=96, capacity_level0=1024,
                       capacity_decay=0.5, min_capacity=256, sigma=0.6)
    model = LNNSeq(cfg, rt)

    frames = []
    base = rng.normal(size=(80, 3)).astype(np.float32) * 2
    for t in range(3):
        pos = np.zeros((96, 3), np.float32)
        pos[:80] = base + t * 0.3
        val = np.zeros((96, 1), np.float32)
        val[:80] = rng.random((80, 1))
        msk = np.zeros(96, bool)
        msk[:80] = True
        frames.append((jnp.asarray(pos), jnp.asarray(val), jnp.asarray(msk)))

    variables = jax.jit(lambda k: model.init(
        k, frames[0][0], frames[0][1], frames[0][2], init_state(cfg, rt),
        final=True))(jax.random.PRNGKey(0))
    params = {"params": variables["params"]}

    ns_a, step_a, final_a = make_streaming_inference(model, cfg, rt)
    sa = ns_a()
    for t in range(2):
        sa = step_a(params, *frames[t], sa)
    logp_a, _, _, _ = final_a(params, *frames[2], sa)

    new_b, step_full, step_inc, final_b = \
        make_streaming_inference_incremental(model, cfg, rt, max_new=512)
    sb, fsb = new_b()
    sb, fsb = step_full(params, *frames[0], sb, fsb)
    sb, fsb = step_inc(params, *frames[1], sb, fsb)
    logp_b, _, _, _, _ = final_b(params, *frames[2], sb, fsb)

    m = np.asarray(frames[2][2])
    np.testing.assert_allclose(np.asarray(logp_a)[m], np.asarray(logp_b)[m],
                               atol=1e-5)
    assert not bool(fsb.overflowed)

    # overflow flag: a tiny max_new bound must trip it (sticky) once a
    # frame grows past the bound
    new_c, sf_c, si_c, fin_c = make_streaming_inference_incremental(
        model, cfg, rt, max_new=8)
    sc, fsc = new_c()
    sc, fsc = sf_c(params, *frames[0], sc, fsc)
    assert not bool(fsc.overflowed)         # full build never overflows
    sc, fsc = si_c(params, *frames[1], sc, fsc)
    assert bool(fsc.overflowed)             # growth >> 8
    sc, fsc = si_c(params, *frames[2], sc, fsc)
    assert bool(fsc.overflowed)             # sticky


def test_blocked_seg_scan_matches_associative_scan(rng):
    """The two-level blocked segmented scan must be numerically identical
    to jax.lax.associative_scan for both combine functions, including
    ragged segment/block alignments and the non-divisible fallback."""
    from temporal_latticenet_tpu.ops import seq_lattice as sl

    def comb_copy(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)

    def comb_sum(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb[..., None], vb, va + vb)

    for q in (1024, 4096, 1000):
        head = jnp.asarray(rng.random(q) < 0.05)
        head = head.at[0].set(True)
        v1 = jnp.asarray(rng.normal(size=(q,)).astype(np.float32))
        vk = jnp.asarray(rng.normal(size=(q, 4)).astype(np.float32))

        ref1 = jax.lax.associative_scan(comb_copy, (head, v1))[1]
        np.testing.assert_allclose(
            np.asarray(sl._blocked_seg_scan(comb_copy, head, v1)),
            np.asarray(ref1), rtol=1e-6)

        refk = jax.lax.associative_scan(comb_sum, (head, vk))[1]
        np.testing.assert_allclose(
            np.asarray(sl._blocked_seg_scan(comb_sum, head, vk)),
            np.asarray(refk), rtol=1e-5, atol=1e-5)


def test_sorted_vals_match_gather_path(rng):
    """pn_values carried (uint32-packed) through the union sorts must equal
    the pointnet's (Q, v+1)-row gather by ``so`` at the precision the
    consumers use: values at bf16 (the MLP's own cast), bary on the
    1/65535 grid (the packed max's own quantisation)."""
    pos, msk = _seq(rng)
    for v in (1, 2):  # odd: bary pads a u32 half; even: bary fills one
        vals = jnp.asarray(
            rng.random((pos.shape[0], pos.shape[1], v)).astype(np.float32))
        lat = sl.build_sequence_lattice(pos, msk, SIGMA, CAPS, 2,
                                        pn_values=vals)
        spn = lat.sorted_pn
        assert spn.vals is not None and spn.bary is not None
        assert spn.vals.dtype == jnp.bfloat16
        vals_flat = jnp.repeat(vals.reshape(-1, v), 4, axis=0)
        vb = jnp.concatenate([vals_flat, lat.row_bary.reshape(-1, 1)],
                             1)[spn.so]
        np.testing.assert_array_equal(
            np.asarray((vb[:, :v].astype(jnp.bfloat16)
                        * spn.live[:, None]).astype(np.float32)),
            np.asarray((spn.vals * spn.live[:, None]).astype(np.float32)))
        bary_q = (jnp.clip(vb[:, v], 0.0, 1.0) * 65535.0
                  + 0.5).astype(jnp.uint32).astype(jnp.float32) / 65535.0
        np.testing.assert_array_equal(
            np.asarray(jnp.where(spn.live, bary_q, 0.0)),
            np.asarray(jnp.where(spn.live, spn.bary, 0.0)))


def test_want_row_rel_false_matches(rng):
    """want_row_rel=False zeroes row_rel_pos and drops the unsort's rel
    operands; every other field must be bit-identical."""
    pos, msk = _seq(rng)
    full = sl.build_sequence_lattice(pos, msk, SIGMA, CAPS, 2)
    slim = sl.build_sequence_lattice(pos, msk, SIGMA, CAPS, 2,
                                     want_row_rel=False)
    assert not np.asarray(slim.row_rel_pos).any()
    np.testing.assert_array_equal(np.asarray(full.row_vertex),
                                  np.asarray(slim.row_vertex))
    np.testing.assert_array_equal(np.asarray(full.row_bary),
                                  np.asarray(slim.row_bary))
    np.testing.assert_array_equal(np.asarray(full.sorted_pn.rel),
                                  np.asarray(slim.sorted_pn.rel))
    np.testing.assert_array_equal(np.asarray(full.nr_points),
                                  np.asarray(slim.nr_points))
    for la, lb in zip(full.levels, slim.levels):
        np.testing.assert_array_equal(np.asarray(la.keys),
                                      np.asarray(lb.keys))
        np.testing.assert_array_equal(np.asarray(la.nbr_idx),
                                      np.asarray(lb.nbr_idx))

