"""Interpret-mode oracle tests for the Pallas segmented-scan kernels.

These run the kernels through the Pallas interpreter on CPU (bit-exact
with the Mosaic lowering modulo unsupported-op differences, which the
real-TPU smoke in the round logs covers).  Reference analog:
torch_scatter reductions over sorted runs
(/root/reference/seq_lattice/lattice_modules.py:485-525).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from temporal_latticenet_tpu.ops import pallas_scan as ps


def _runs(rng, q, p=0.02):
    heads = rng.random(q) < p
    heads[0] = True
    return np.cumsum(heads).astype(np.int32)


def _oracle(hc, x, mode):
    exp = x.astype(np.float64).copy()
    for i in range(1, len(hc)):
        if hc[i] == hc[i - 1]:
            if mode == "sum":
                exp[i] += exp[i - 1]
            elif mode == "max":
                exp[i] = np.maximum(exp[i], exp[i - 1])
            else:
                exp[i] = exp[i - 1]
    return exp.astype(x.dtype)


@pytest.mark.parametrize("c", [8, 64, 128])
def test_sorted_segment_max_u32_interpret(c):
    rng = np.random.default_rng(0)
    q = 4096
    hc = _runs(rng, q)
    x = rng.integers(0, 2**32, (q, c), dtype=np.uint32)
    out = ps.sorted_segment_max_u32(jnp.asarray(hc), jnp.asarray(x),
                                    tile=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), _oracle(hc, x, "max"))


@pytest.mark.parametrize("c,mode,dtype", [
    (4, "sum", np.float32),      # the union's in-sort mean data
    (1, "sum", np.int32),        # cumsum / run-rank
    (1, "first", np.int32),      # birth propagation
    (2, "max", np.int32),
    (128, "first", np.float32),
])
def test_sorted_segment_scan_interpret(c, mode, dtype):
    rng = np.random.default_rng(1)
    q = 4096
    hc = _runs(rng, q)
    if dtype == np.float32:
        x = rng.standard_normal((q, c)).astype(dtype)
    else:
        x = rng.integers(0, 1000, (q, c)).astype(dtype)
    out = ps.sorted_segment_scan(jnp.asarray(hc), jnp.asarray(x), mode,
                                 rows=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), _oracle(hc, x, mode),
                               atol=1e-3)


def test_sorted_segment_scan_padding():
    """Non-multiple Q pads with fresh run ids and identity values."""
    rng = np.random.default_rng(2)
    q = 1000                      # far from a multiple of rows * (128 // c)
    hc = _runs(rng, q)
    x = rng.standard_normal((q, 4)).astype(np.float32)
    out = ps.sorted_segment_scan(jnp.asarray(hc), jnp.asarray(x), "sum",
                                 rows=64, interpret=True)
    assert out.shape == (q, 4)
    np.testing.assert_allclose(np.asarray(out), _oracle(hc, x, "sum"),
                               atol=1e-3)


def test_backward_tail_copy_via_reversed_first():
    """The backward tail-copy Pallas recipe (formerly seq_lattice.
    _seg_copy_tail_rows, deleted r4 with the losing MEAN_MODEs -- the
    kernel-level recipe stays covered): reverse rows, remap run ids
    to ``ids[-1] - ids[::-1]`` (nondecreasing, so the kernel's fresh-run
    padding cannot collide), run the "first" scan, reverse back.  Every
    row must receive its run TAIL's value."""
    rng = np.random.default_rng(4)
    q = 3000
    tails = rng.random(q) < 0.05
    tails[-1] = True
    heads = np.concatenate([[True], tails[:-1]])
    ids = np.cumsum(heads).astype(np.int32)
    x = rng.standard_normal((q, 4)).astype(np.float32)

    rev_ids = jnp.asarray(ids[-1] - ids[::-1])
    out = ps.sorted_segment_scan(rev_ids, jnp.asarray(x[::-1]), "first",
                                 rows=64, interpret=True)
    got = np.asarray(out)[::-1]

    exp = x.copy()
    for i in range(q - 2, -1, -1):
        if not tails[i]:
            exp[i] = exp[i + 1]
    np.testing.assert_array_equal(got, exp)


def test_single_run_is_cumulative():
    """All-equal run ids turn the scan into a plain cumulative op (the
    _blocked_cumsum accelerator route)."""
    rng = np.random.default_rng(3)
    q = 2048
    x = rng.integers(0, 3, (q, 1)).astype(np.int32)
    hc = np.zeros(q, np.int32)
    out = ps.sorted_segment_scan(jnp.asarray(hc), jnp.asarray(x), "sum",
                                 rows=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(out)[:, 0], np.cumsum(x[:, 0]))


def _seg_max_oracle_tails(heads, x, tails_idx):
    """Per-tail true segment max (numpy)."""
    ids = np.cumsum(heads)
    out = []
    for t in tails_idx:
        seg = ids[t]
        lo = t
        while lo > 0 and ids[lo - 1] == seg:
            lo -= 1
        out.append(x[lo:t + 1].max(axis=0))
    return np.stack(out)


def test_twolevel_tail_max_adversarial():
    """The capped-window + summary-correction tail max equals the true
    per-segment max for run lengths spanning 1..hundreds, with heads and
    tails landing on chunk and tile boundaries."""
    from temporal_latticenet_tpu.ops import segment as seg

    rng = np.random.default_rng(7)
    chunk = 16
    q = 8192                       # 4 kernel tiles at the default 2048
    # adversarial run lengths: many short, some spanning several chunks,
    # one spanning more than a tile; plus exact chunk/tile alignments
    lens = []
    while sum(lens) < q - 3000:
        lens.append(int(rng.choice([1, 2, 3, 7, chunk - 1, chunk,
                                    chunk + 1, 2 * chunk, 100])))
    lens += [2500, 16, 1]          # > tile, exactly chunk, singleton
    lens.append(q - sum(lens))
    heads = np.zeros(q, bool)
    pos = 0
    for ln in lens:
        heads[pos] = True
        pos += ln
    assert pos == q
    tails_idx = np.concatenate([np.flatnonzero(heads)[1:] - 1, [q - 1]])

    x = rng.integers(0, 2**32, (q, 8), dtype=np.uint32)
    got = seg._seg_max_tails_twolevel(
        jnp.asarray(heads), jnp.asarray(x), jnp.asarray(tails_idx),
        chunk=chunk, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got), _seg_max_oracle_tails(heads, x, tails_idx))


def test_twolevel_tail_max_unpadded_q():
    """Q not a multiple of chunk or tile still pads correctly."""
    from temporal_latticenet_tpu.ops import segment as seg

    rng = np.random.default_rng(8)
    q = 3001
    heads = rng.random(q) < 0.08
    heads[0] = True
    tails_idx = np.concatenate([np.flatnonzero(heads)[1:] - 1, [q - 1]])
    x = rng.integers(0, 2**32, (q, 4), dtype=np.uint32)
    got = seg._seg_max_tails_twolevel(
        jnp.asarray(heads), jnp.asarray(x), jnp.asarray(tails_idx),
        chunk=16, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got), _seg_max_oracle_tails(heads, x, tails_idx))


def test_seg_sum_tails_exact():
    """Chunk scan + summary chain == exact per-run sums at tails, for run
    lengths from 1 to several chunks, integer-valued f32 (exact adds)."""
    rng = np.random.default_rng(9)
    q, c = 4096, 4                 # g = 32 originals per chunk
    lens = []
    while sum(lens) < q - 400:
        lens.append(int(rng.choice([1, 2, 5, 31, 32, 33, 64, 200])))
    lens.append(q - sum(lens))
    heads = np.zeros(q, bool)
    pos = 0
    for ln in lens:
        heads[pos] = True
        pos += ln
    ids = np.cumsum(heads).astype(np.int32)
    tails_idx = np.concatenate([np.flatnonzero(heads)[1:] - 1, [q - 1]])
    x = rng.integers(0, 100, (q, c)).astype(np.float32)

    got = ps.seg_sum_tails(jnp.asarray(ids), jnp.asarray(x),
                           jnp.asarray(tails_idx), interpret=True)
    exp = np.stack([x[ids == ids[t]].sum(axis=0) for t in tails_idx])
    np.testing.assert_array_equal(np.asarray(got), exp)
