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
    """The _seg_copy_tail_rows Pallas recipe: reverse rows, remap run ids
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
