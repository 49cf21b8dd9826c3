"""Interpret-mode exactness tests for the fused simplex/pack kernel.

The kernel must be BIT-EXACT with the jnp reference path on keys (the
streaming per-frame path keeps using permutohedral.find_enclosing_simplex;
both paths must assign identical lattice indices) and near-exact on
barycentric weights.  Reference analog: the elevation/rank stage of the
CUDA distribute kernel (/root/reference/seq_lattice/models.py:297-298).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from temporal_latticenet_tpu.ops import permutohedral as pm
from temporal_latticenet_tpu.ops.pallas_simplex import fused_simplex_pack
from temporal_latticenet_tpu.ops.vertex_table import (SENTINEL, pack_keys,
                                                      PACKED_SENTINEL)


def _reference(positions, mask, sigma):
    elevated = pm.elevate(jnp.asarray(positions), sigma)
    keys, bary = pm.find_enclosing_simplex(elevated)     # (N, 4, 3)
    flat = jnp.where(jnp.repeat(jnp.asarray(mask), 4)[:, None],
                     keys.reshape(-1, 3), SENTINEL)
    return np.asarray(pack_keys(flat)).reshape(-1, 4), np.asarray(bary)


@pytest.mark.parametrize("sigma", [0.6, 1.7])
def test_fused_matches_reference(sigma):
    rng = np.random.default_rng(0)
    n = 1500                                      # exercises padding too
    pos = (rng.standard_normal((n, 3)) * 25).astype(np.float32)
    mask = rng.random(n) < 0.9
    packed, bary = fused_simplex_pack(jnp.asarray(pos), jnp.asarray(mask),
                                      sigma, rows=8, interpret=True)
    ref_packed, ref_bary = _reference(pos, mask, sigma)
    np.testing.assert_array_equal(np.asarray(packed), ref_packed)
    np.testing.assert_allclose(np.asarray(bary), ref_bary, atol=1e-6)


def test_fused_out_of_range_and_masked():
    """Far-away points exceed the packed 10-bit range -> PACKED_SENTINEL,
    exactly like pack_keys; masked points too."""
    pos = np.array([[0.0, 0.0, 0.0],
                    [1e5, 1e5, 1e5],             # out of packed range
                    [1.0, 2.0, 3.0]], np.float32)
    mask = np.array([True, True, False])
    packed, _ = fused_simplex_pack(jnp.asarray(pos), jnp.asarray(mask),
                                   0.6, rows=8, interpret=True)
    packed = np.asarray(packed)
    ref_packed, _ = _reference(pos, mask, 0.6)
    np.testing.assert_array_equal(packed, ref_packed)
    assert (packed[1] == PACKED_SENTINEL).all()
    assert (packed[2] == PACKED_SENTINEL).all()
    assert (packed[0] != PACKED_SENTINEL).all()


def test_fused_lattice_points_on_boundaries():
    """Points exactly ON lattice vertices / simplex boundaries take the
    same rounding decisions as the reference (tie-breaking paths)."""
    # lattice vertex positions round-trip: use integer-ish inputs at a
    # sigma that lands elevated coordinates on exact multiples of 4
    rng = np.random.default_rng(1)
    base = rng.integers(-8, 8, (400, 3)).astype(np.float32)
    pos = np.concatenate([base, base * 0.5, np.zeros((1, 3), np.float32)])
    mask = np.ones(len(pos), bool)
    packed, bary = fused_simplex_pack(jnp.asarray(pos), jnp.asarray(mask),
                                      1.0, rows=8, interpret=True)
    ref_packed, ref_bary = _reference(pos, mask, 1.0)
    np.testing.assert_array_equal(np.asarray(packed), ref_packed)
    np.testing.assert_allclose(np.asarray(bary), ref_bary, atol=1e-6)
