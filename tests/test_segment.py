"""Segment-reduction tests (ops/segment.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from temporal_latticenet_tpu.ops import segment as seg


def test_packed_max_gradient_flows_to_winners(rng):
    """r3 regression: the packed bf16 max is built from bitcasts, which have
    no VJP -- without the custom straight-through VJP the pointnet MLP gets
    exactly zero gradient.  Winners must receive the segment cotangent; the
    sparsity pattern must match the differentiable f32 argmax path."""
    R, C, S = 128, 8, 16
    x = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    bary = jnp.asarray(rng.random(R).astype(np.float32))
    rid = jnp.asarray(rng.integers(0, S, R))
    valid = jnp.asarray(rng.random(R) > 0.1)

    def f_packed(x_):
        mx, bs = seg.segment_max_with_bary_packed(
            x_.astype(jnp.bfloat16), bary, rid, S, valid)
        return (mx * jnp.arange(1.0, C + 1.0)).sum()

    def f_f32(x_):
        mx, _ = seg.segment_max_with_argmax(x_, rid, S, valid)
        return (mx * jnp.arange(1.0, C + 1.0)).sum()

    gp = np.asarray(jax.grad(f_packed)(x), np.float32)
    gf = np.asarray(jax.grad(f_f32)(x), np.float32)
    assert np.abs(gp).sum() > 0
    # bf16 rounding can tie rows the f32 path distinguishes; patterns must
    # agree except at those rare ties
    agree = (gp != 0) == (gf != 0)
    assert agree.mean() > 0.99, agree.mean()
    both = (gp != 0) & (gf != 0)
    np.testing.assert_allclose(gp[both], gf[both], rtol=1e-2)

    # under jit+vmap (the training path)
    gb = jax.jit(jax.vmap(jax.grad(f_packed)))(jnp.stack([x, x + 1]))
    assert np.abs(np.asarray(gb)).sum() > 0


def test_sorted_packed_max_matches_per_frame_segment_max(rng):
    """r3 batched-pointnet core: the blocked max-scan over union-sorted
    contiguous buckets must equal the per-frame packed segment_max on the
    same rows, gradients included."""
    from temporal_latticenet_tpu.ops import seq_lattice as sl
    from temporal_latticenet_tpu.ops.vertex_table import SENTINEL, pack_keys
    from temporal_latticenet_tpu.ops import permutohedral as pm

    T, P, cap = 3, 256, 512
    pts = rng.normal(size=(T, P, 3)).astype(np.float32) * 3
    msk = np.ones((T, P), bool)
    msk[:, 200:] = False

    elevated = pm.elevate(jnp.asarray(pts).reshape(T * P, 3), 0.6)
    keys, bary = pm.find_enclosing_simplex(elevated)
    rvalid = jnp.repeat(jnp.asarray(msk), 4, axis=1)
    flat = jnp.where(rvalid.reshape(-1)[:, None],
                     keys.reshape(-1, 3), SENTINEL)
    cand = pack_keys(flat)
    pos_rows = jnp.repeat(jnp.asarray(pts), 4, axis=1).reshape(-1, 3)
    packed0, birth0, row_idx, counts0, rel, nrp, spn = \
        sl._union_with_birth_and_mean(cand, pos_rows, cap, T)
    assert spn is not None

    C = 8
    feat = rng.normal(size=(T * P * 4, C)).astype(np.float32)
    baryr = rng.random(T * P * 4).astype(np.float32)
    feat_j = jnp.asarray(feat)
    bary_j = jnp.asarray(baryr)

    # reference: per-frame packed segment max in original row order
    row_vertex = row_idx.reshape(T, P * 4)
    row_valid = rvalid & (row_vertex > 0)
    ref_mx, ref_bs = [], []
    for t in range(T):
        fr = feat_j.reshape(T, P * 4, C)[t].astype(jnp.bfloat16)
        mx, bs = seg.segment_max_with_bary_packed(
            fr, bary_j.reshape(T, P * 4)[t], row_vertex[t], cap,
            row_valid[t])
        ref_mx.append(np.asarray(mx))
        ref_bs.append(np.asarray(bs))

    # batched: sorted rows via spn.so
    feat_s = feat_j[spn.so].astype(jnp.bfloat16)
    bary_s = bary_j[spn.so]
    mx, bs = seg.sorted_packed_max(feat_s, bary_s, spn.live, spn.head_vf,
                                   spn.bucket, spn.tailpos, nrp > 0)
    mx = np.asarray(mx).reshape(T, cap, C)
    bs = np.asarray(bs).reshape(T, cap, C)
    for t in range(T):
        np.testing.assert_array_equal(mx[t], ref_mx[t], err_msg=f"mx t={t}")
        np.testing.assert_array_equal(bs[t], ref_bs[t], err_msg=f"bs t={t}")

    # gradient equality (straight-through winners)
    def loss_sorted(f):
        m_, b_ = seg.sorted_packed_max(f[spn.so].astype(jnp.bfloat16),
                                       bary_s, spn.live, spn.head_vf,
                                       spn.bucket, spn.tailpos, nrp > 0)
        return (m_ * 1.5).sum() + b_.sum()

    def loss_frames(f):
        tot = 0.0
        fr_all = f.reshape(T, P * 4, C)
        for t in range(T):
            m_, b_ = seg.segment_max_with_bary_packed(
                fr_all[t].astype(jnp.bfloat16), bary_j.reshape(T, P * 4)[t],
                row_vertex[t], cap, row_valid[t])
            tot = tot + (m_ * 1.5).sum() + b_.sum()
        return tot

    g1 = np.asarray(jax.grad(loss_sorted)(feat_j))
    g2 = np.asarray(jax.grad(loss_frames)(feat_j))
    np.testing.assert_allclose(g1, g2, atol=1e-5)
