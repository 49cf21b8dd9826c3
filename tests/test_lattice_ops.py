import jax
import jax.numpy as jnp
import numpy as np

from temporal_latticenet_tpu.ops import lattice_ops as lo
from temporal_latticenet_tpu.ops import segment as seg
from temporal_latticenet_tpu.ops import vertex_table as vt

SIGMA = 0.6


def _cloud(rng, n, scale=5.0):
    return jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * scale)


def test_distribute_basic(rng):
    pos = _cloud(rng, 64)
    mask = jnp.ones(64, bool)
    t = vt.make_table(1024, 3)
    t, out = lo.distribute(t, pos, mask, SIGMA)

    assert int(t.count) > 1
    rv = np.asarray(out.row_vertex)
    assert (rv[np.asarray(out.row_valid)] > 0).all()
    # each point's 4 bary weights sum to 1
    np.testing.assert_allclose(np.asarray(out.point_bary).sum(-1), 1.0, atol=1e-4)


def test_distribute_masked_points_do_not_insert(rng):
    pos = _cloud(rng, 32)
    mask = jnp.asarray(np.arange(32) < 16)
    t0 = vt.make_table(1024, 3)
    t_half, out = lo.distribute(t0, pos, mask, SIGMA)
    t_full, _ = lo.distribute(t0, pos, jnp.ones(32, bool), SIGMA)
    assert int(t_half.count) < int(t_full.count)
    rv = np.asarray(out.point_vertex)
    assert (rv[16:] == 0).all()
    assert (np.asarray(out.point_bary)[16:] == 0).all()


def test_distribute_append_only_across_frames(rng):
    t = vt.make_table(4096, 3)
    posA = _cloud(rng, 128)
    t, outA = lo.distribute(t, posA, jnp.ones(128, bool), SIGMA)
    cA = int(t.count)

    posB = _cloud(rng, 128) + 3.0
    t, outB = lo.distribute(t, posB, jnp.ones(128, bool), SIGMA)
    assert int(t.count) >= cA

    # re-splatting frame A's points reuses the exact same indices
    t2, outA2 = lo.distribute(t, posA, jnp.ones(128, bool), SIGMA)
    np.testing.assert_array_equal(
        np.asarray(outA2.point_vertex), np.asarray(outA.point_vertex))
    assert int(t2.count) == int(t.count)


def test_splat_slice_roundtrip_constant(rng):
    """Splatting a constant field and slicing back must reproduce it exactly
    (barycentric partition of unity)."""
    pos = _cloud(rng, 128)
    t = vt.make_table(4096, 3)
    t, out = lo.distribute(t, pos, jnp.ones(128, bool), SIGMA)

    values = jnp.zeros((4096, 2)).at[:, 0].set(7.5).at[:, 1].set(-2.0)
    values = jnp.where((jnp.arange(4096) > 0)[:, None], values, 0.0)
    sliced = lo.slice_gather(values, out.point_vertex, out.point_bary)
    np.testing.assert_allclose(np.asarray(sliced)[:, 0], 7.5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sliced)[:, 1], -2.0, atol=1e-3)


def test_splat_slice_roundtrip_linear(rng):
    """A linear function of the elevated coordinates is reproduced exactly by
    barycentric interpolation of its vertex samples."""
    pos = _cloud(rng, 64)
    t = vt.make_table(4096, 3)
    t, out = lo.distribute(t, pos, jnp.ones(64, bool), SIGMA)

    # sample f(key) = a . key at each vertex
    a = jnp.asarray([0.3, -1.2, 0.7])
    valid = t.keys[:, 0] != vt.SENTINEL
    f = jnp.where(valid, t.keys.astype(jnp.float32) @ a, 0.0)[:, None]
    f = lo.mask_rows(f, t.count)

    sliced = lo.slice_gather(f, out.point_vertex, out.point_bary)

    from temporal_latticenet_tpu.ops import permutohedral as pm
    elev = pm.elevate(pos, SIGMA)
    want = elev[:, :3] @ a
    np.testing.assert_allclose(np.asarray(sliced)[:, 0], np.asarray(want),
                               atol=5e-2, rtol=1e-3)


def test_neighbor_table_symmetry(rng):
    pos = _cloud(rng, 256, scale=2.0)
    t = vt.make_table(4096, 3)
    t, _ = lo.distribute(t, pos, jnp.ones(256, bool), SIGMA)
    nbr = lo.build_neighbor_table(t)
    idx, found = np.asarray(nbr.idx), np.asarray(nbr.found)
    cnt = int(t.count)

    # center column: self, always found for occupied slots (except slot 0)
    np.testing.assert_array_equal(idx[1:cnt, -1], np.arange(1, cnt))
    assert found[1:cnt, -1].all()
    assert not found[0].any()
    assert not found[cnt:].any()

    # symmetry: neighbor via +o_k has us as its -o_k neighbor
    for v in range(1, cnt):
        for k in range(4):
            if found[v, k]:
                u = idx[v, k]
                assert found[u, k + 4] and idx[u, k + 4] == v


def test_lattice_conv_center_identity(rng):
    pos = _cloud(rng, 128)
    t = vt.make_table(2048, 3)
    t, out = lo.distribute(t, pos, jnp.ones(128, bool), SIGMA)
    nbr = lo.build_neighbor_table(t)

    c = 8
    vals = jnp.asarray(rng.normal(size=(2048, c)).astype(np.float32))
    vals = lo.mask_rows(vals, t.count)

    # weight = selects the center tap (last of 9) as identity
    w = np.zeros((9 * c, c), np.float32)
    w[8 * c:, :] = np.eye(c)
    got = lo.lattice_conv(vals, nbr, jnp.asarray(w), t.count)
    np.testing.assert_allclose(np.asarray(got), np.asarray(vals), atol=1e-5)


def test_lattice_conv_averaging_reduces_variance(rng):
    pos = _cloud(rng, 512, scale=1.5)
    t = vt.make_table(4096, 3)
    t, _ = lo.distribute(t, pos, jnp.ones(512, bool), SIGMA)
    nbr = lo.build_neighbor_table(t)
    vals = lo.mask_rows(jnp.asarray(rng.normal(size=(4096, 4)).astype(np.float32)), t.count)
    w = np.full((9 * 4, 4), 0.0, np.float32)
    for k in range(9):
        w[k * 4:(k + 1) * 4] = np.eye(4) / 9.0
    got = np.asarray(lo.lattice_conv(vals, nbr, jnp.asarray(w), t.count))
    cnt = int(t.count)
    assert got[1:cnt].std() < np.asarray(vals)[1:cnt].std()


def test_coarsen_link_covers_every_fine_vertex(rng):
    pos = _cloud(rng, 256, scale=4.0)
    fine = vt.make_table(4096, 3)
    fine, _ = lo.distribute(fine, pos, jnp.ones(256, bool), SIGMA)
    coarse = vt.make_table(4096, 3)
    coarse, link = lo.grow_coarse_table(fine, coarse)

    nf, nc = int(fine.count), int(coarse.count)
    # for dense clouds nc << nf; for sparse ones corners barely overlap and
    # nc can exceed nf, bounded by (d+1)x
    assert 1 < nc <= 4 * nf
    ci, cb = np.asarray(link.corner_idx), np.asarray(link.corner_bary)

    # every occupied fine vertex couples to real coarse vertices with weights
    # summing to 1 (partition of unity)
    assert (ci[1:nf] > 0).all()
    np.testing.assert_allclose(cb[1:nf].sum(-1), 1.0, atol=1e-4)
    # invalid fine rows carry zero weight
    assert (cb[nf:] == 0).all() and (cb[0] == 0).all()


def test_splat_slice_between_levels_roundtrip(rng):
    """A constant field splat down and sliced back stays constant."""
    pos = _cloud(rng, 256, scale=4.0)
    fine = vt.make_table(4096, 3)
    fine, _ = lo.distribute(fine, pos, jnp.ones(256, bool), SIGMA)
    coarse = vt.make_table(4096, 3)
    coarse, link = lo.grow_coarse_table(fine, coarse)
    nf = int(fine.count)

    const = lo.mask_rows(jnp.full((4096, 2), 3.0), fine.count)
    sliced = lo.slice_to_fine(
        lo.mask_rows(jnp.full((4096, 2), 3.0), coarse.count), link)
    np.testing.assert_allclose(np.asarray(sliced)[1:nf], 3.0, atol=1e-4)

    # splat conserves mass: total fine value == total coarse value
    pooled = lo.splat_to_coarse(const, link, 4096)
    pooled = lo.mask_rows(pooled, coarse.count)
    np.testing.assert_allclose(float(pooled.sum()), float(const.sum()),
                               rtol=1e-5)


def test_segment_max_with_argmax(rng):
    data = rng.normal(size=(40, 3)).astype(np.float32)
    ids = rng.integers(0, 8, size=40).astype(np.int32)
    valid = rng.random(40) > 0.2
    mx, arg = seg.segment_max_with_argmax(
        jnp.asarray(data), jnp.asarray(ids), 8, jnp.asarray(valid))
    mx, arg = np.asarray(mx), np.asarray(arg)
    for s in range(8):
        sel = (ids == s) & valid
        for c in range(3):
            if sel.any():
                assert np.isclose(mx[s, c], data[sel, c].max())
                assert sel[arg[s, c]] and np.isclose(data[arg[s, c], c], mx[s, c])
            else:
                assert mx[s, c] == 0.0 and arg[s, c] == -1


def test_mask_rows():
    x = jnp.ones((8, 2))
    got = np.asarray(lo.mask_rows(x, jnp.int32(5)))
    assert (got[0] == 0).all() and (got[5:] == 0).all() and (got[1:5] == 1).all()


def test_splat_classic_matches_oracle(rng):
    """splat_classic: barycentric-weighted scatter equals a numpy loop."""
    pos = _cloud(rng, 96)
    t = vt.make_table(2048, 3)
    t, out = lo.distribute(t, pos, jnp.ones(96, bool), SIGMA)

    vals = jnp.asarray(rng.normal(size=(96, 5)).astype(np.float32))
    got = np.asarray(lo.splat_classic(vals, out.point_vertex, out.point_bary,
                                      2048))

    want = np.zeros((2048, 5), np.float32)
    pv = np.asarray(out.point_vertex)
    pb = np.asarray(out.point_bary)
    v = np.asarray(vals)
    for p in range(96):
        for k in range(4):
            want[pv[p, k]] += pb[p, k] * v[p]
    want[0] = 0.0
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_slice_classic_is_plain_barycentric(rng):
    """slice_classic == the undeformed slice path (models.py:466 commented
    alternate): exactly slice_gather, and a constant field round-trips."""
    pos = _cloud(rng, 64)
    t = vt.make_table(2048, 3)
    t, out = lo.distribute(t, pos, jnp.ones(64, bool), SIGMA)

    values = jnp.zeros((2048, 3)).at[:, 1].set(4.25)
    values = lo.mask_rows(values, t.count)
    got = lo.slice_classic(values, out.point_vertex, out.point_bary)
    np.testing.assert_allclose(np.asarray(got)[:, 1], 4.25, atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(got),
        np.asarray(lo.slice_gather(values, out.point_vertex, out.point_bary)))


def test_segment_max_with_bary_packed_matches_argmax_path(rng):
    """The one-pass packed max must agree with the argmax-recovery chain:
    identical bf16 max values, and the winner's bary up to the 1/65535
    quantisation (ties in bf16 values may legitimately pick a different
    winner -- avoided here by construction)."""
    R, S, C = 400, 64, 8
    ids = jnp.asarray(rng.integers(0, S, R).astype(np.int32))
    # distinct values per row so bf16 ties can't occur within a segment
    base = np.linspace(-3, 3, R)[:, None] + rng.normal(size=(1, C)) * 0.01
    x = jnp.asarray(base.astype(np.float32)).astype(jnp.bfloat16)
    bary = jnp.asarray(rng.random(R).astype(np.float32))
    valid = jnp.asarray(rng.random(R) > 0.15)

    mx_p, bary_p = seg.segment_max_with_bary_packed(x, bary, ids, S, valid)
    mx_a, arg = seg.segment_max_with_argmax(x, ids, S, valid)
    bary_a = jnp.where(arg >= 0, bary[jnp.maximum(arg, 0)], 0.0)

    np.testing.assert_array_equal(np.asarray(mx_p),
                                  np.asarray(mx_a, np.float32))
    np.testing.assert_allclose(np.asarray(bary_p), np.asarray(bary_a),
                               atol=1.0 / 65535 + 1e-7)


def test_update_neighbor_table_matches_full_rebuild(rng):
    """Incremental adjacency update after an append-only union must equal a
    full rebuild exactly (idx AND found), including reverse taps into old
    vertices and new-new pairs."""
    t = vt.make_table(4096, 3)
    cloud0 = _cloud(rng, 200, scale=2.0)
    t, _ = lo.distribute(t, cloud0, jnp.ones(200, bool), SIGMA)
    nbr0 = lo.build_neighbor_table(t)
    c0 = t.count

    # second frame: shifted + some fresh region -> new vertices appended
    cloud1 = jnp.concatenate([cloud0 + 0.4, _cloud(rng, 80, scale=3.0) + 5.0])
    t, _ = lo.distribute(t, cloud1, jnp.ones(280, bool), SIGMA)

    full = lo.build_neighbor_table(t)
    inc = lo.update_neighbor_table(t, nbr0, c0, max_new=2048)

    np.testing.assert_array_equal(np.asarray(inc.found), np.asarray(full.found))
    # idx only meaningful where found (absent taps hold 0 vs whatever)
    f = np.asarray(full.found)
    np.testing.assert_array_equal(np.asarray(inc.idx)[f],
                                  np.asarray(full.idx)[f])
    # center column always equals self for valid rows
    cnt = int(t.count)
    np.testing.assert_array_equal(np.asarray(inc.idx)[1:cnt, -1],
                                  np.arange(1, cnt))


def test_gather8_sym_vjp_matches_plain_gather(rng):
    """The symmetric-adjoint conv gather (custom VJP = transposed gather
    instead of scatter-add) must produce identical values AND gradients to
    the plain take on a real neighbor table."""
    from temporal_latticenet_tpu.ops import vertex_table as vt

    table = vt.make_table(512, 3)
    pts = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32) * 3)
    msk = jnp.ones((300,), bool)
    table, _ = lo.distribute(table, pts, msk, 0.6)
    nbr = lo.build_neighbor_table(table)
    count = table.count

    x = jnp.asarray(rng.normal(size=(512, 16)).astype(np.float32))
    x = lo.mask_rows(x, count)
    w = jnp.asarray(rng.normal(size=(9 * 16, 8)).astype(np.float32))

    def f_plain(x_):
        g = x_[nbr.idx].reshape(512, -1)
        return (lo.mask_rows(g @ w, count) ** 2).sum()

    def f_sym(x_):
        g = lo.gather_rowified(x_, nbr)
        return (lo.mask_rows(g @ w, count) ** 2).sum()

    v1, g1 = jax.value_and_grad(f_plain)(x)
    v2, g2 = jax.value_and_grad(f_sym)(x)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    # row 0 is the invalid bucket: its cotangent is junk by design in the
    # symmetric adjoint and masked upstream in the real model
    np.testing.assert_allclose(np.asarray(g1)[1:], np.asarray(g2)[1:],
                               rtol=1e-5, atol=1e-5)


def test_sorted_splat_matches_scatter_and_grads(rng):
    """r3: the dst-sorted coarsen splat (gather + segmented sum + tail
    gather) must equal the scatter-add path in values AND in the gradient
    w.r.t. fine values (its VJP is the barycentric slice)."""
    pos = _cloud(rng, 256, scale=2.0)
    fine = vt.make_table(2048, 3)
    fine, _ = lo.distribute(fine, pos, jnp.ones(256, bool), SIGMA)
    coarse = vt.make_table(1024, 3)
    coarse, link = lo.grow_coarse_table(fine, coarse)

    c = 8
    vals = jnp.asarray(rng.normal(size=(2048, c)).astype(np.float32))
    vals = lo.mask_rows(vals, fine.count)

    plain = lo.splat_to_coarse(vals, link, 1024)
    link_s = lo.augment_link_sorted(link, 1024)
    assert link_s.sorted_src is not None
    fast = lo.splat_to_coarse(vals, link_s, 1024)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(plain),
                               atol=1e-4)

    def loss_plain(v):
        return (lo.splat_to_coarse(v, link, 1024) ** 2).sum()

    def loss_fast(v):
        return (lo.splat_to_coarse(v, link_s, 1024) ** 2).sum()

    g_plain = jax.grad(loss_plain)(vals)
    g_fast = jax.grad(loss_fast)(vals)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_plain),
                               atol=1e-3, rtol=1e-4)


def test_slice_to_fine_sorted_vjp_matches_plain(rng):
    """r4: slice_to_fine on an augmented link routes its BACKWARD through
    the dst-sorted splat (the slice's exact transpose) instead of XLA's
    (Cf*4)-row scatter-add; values must be identical and the gradient
    w.r.t. coarse values equal up to f32 summation order."""
    pos = _cloud(rng, 256, scale=2.0)
    fine = vt.make_table(2048, 3)
    fine, _ = lo.distribute(fine, pos, jnp.ones(256, bool), SIGMA)
    coarse = vt.make_table(1024, 3)
    coarse, link = lo.grow_coarse_table(fine, coarse)
    link_s = lo.augment_link_sorted(link, 1024)
    assert link_s.sorted_src is not None

    c = 16  # divides 128: the sorted path engages
    cvals = jnp.asarray(rng.normal(size=(1024, c)).astype(np.float32))
    cvals = lo.mask_rows(cvals, coarse.count)
    probe = jnp.asarray(rng.normal(size=(2048, c)).astype(np.float32))

    plain = lo.slice_to_fine(cvals, link)
    fast = lo.slice_to_fine(cvals, link_s)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(plain))

    def loss_plain(v):
        return (lo.slice_to_fine(v, link) * probe).sum()

    def loss_fast(v):
        return (lo.slice_to_fine(v, link_s) * probe).sum()

    g_plain = jax.grad(loss_plain)(cvals)
    g_fast = jax.grad(loss_fast)(cvals)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_plain),
                               atol=1e-4, rtol=1e-4)


def test_aflow_sym_gather_grads_match_plain(rng):
    """r4: AFlow's 8 neighbor taps ride _gather8_sym; the full-module
    gradients (params AND hidden state) must match a plain-gather variant
    -- including the row-0/padding cotangent hygiene the mask_rows VJP
    provides in-model, reproduced here by probing through mask_rows."""
    from temporal_latticenet_tpu.models.fusion import AFlowFusion

    table = vt.make_table(512, 3)
    pts = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32) * 3)
    table, _ = lo.distribute(table, pts, jnp.ones((300,), bool), 0.6)
    nbr = lo.build_neighbor_table(table)
    count = table.count
    c = 16

    mod = AFlowFusion(c)
    lv = lo.mask_rows(
        jnp.asarray(rng.normal(size=(512, c)).astype(np.float32)), count)
    h = lo.mask_rows(
        jnp.asarray(rng.normal(size=(512, c)).astype(np.float32)), count)
    params = mod.init(jax.random.PRNGKey(0), lv, h, count, count,
                      jnp.bool_(False), nbr)["params"]
    probe = jnp.asarray(rng.normal(size=(512, c)).astype(np.float32))

    def loss(p, h_):
        # mask_rows on the INPUT hidden state reproduces the in-model
        # invariant that rows 0 / >= count carry zero cotangent
        out, _ = mod.apply({"params": p}, lv, lo.mask_rows(h_, count),
                           count, count, jnp.bool_(False), nbr)
        return (out * probe).sum()

    g_new = jax.grad(loss, argnums=(0, 1))(params, h)

    import temporal_latticenet_tpu.models.fusion as fusion_mod
    orig = fusion_mod.lo._gather8_sym
    try:
        fusion_mod.lo._gather8_sym = lambda v, i: v[i]
        g_ref = jax.grad(loss, argnums=(0, 1))(params, h)
    finally:
        fusion_mod.lo._gather8_sym = orig

    for a, b in zip(jax.tree_util.tree_leaves(g_new),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
