import jax.numpy as jnp
import numpy as np
import pytest

from temporal_latticenet_tpu.ops import permutohedral as pm
from tests import oracle


def _full_key(key_d):
    """Reconstruct the redundant last coordinate (full key sums to 0)."""
    return np.concatenate([key_d, -key_d.sum(-1, keepdims=True)], axis=-1)


def test_elevation_matches_oracle(rng):
    x = rng.normal(size=(64, 3)).astype(np.float32) * 30
    got = np.asarray(pm.elevate(jnp.asarray(x), 0.6))
    want = np.stack([oracle.elevate_point(p, 0.6) for p in x])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_elevated_points_lie_on_hyperplane(rng):
    x = rng.normal(size=(128, 3)).astype(np.float32) * 50
    e = np.asarray(pm.elevate(jnp.asarray(x), 0.6))
    np.testing.assert_allclose(e.sum(-1), 0.0, atol=2e-2)


@pytest.mark.parametrize("scale", [0.1, 1.0, 60.0])
def test_simplex_matches_oracle(rng, scale):
    x = rng.normal(size=(256, 3)) * scale
    elev = np.stack([oracle.elevate_point(p, 0.6) for p in x]).astype(np.float32)
    keys, bary = pm.find_enclosing_simplex(jnp.asarray(elev))
    keys, bary = np.asarray(keys), np.asarray(bary)
    for n in range(x.shape[0]):
        k_want, b_want = oracle.find_simplex_point(elev[n].astype(np.float64))
        np.testing.assert_array_equal(keys[n], k_want)
        np.testing.assert_allclose(bary[n], b_want, atol=1e-5)


def test_simplex_invariants(rng):
    x = rng.normal(size=(512, 3)).astype(np.float32) * 40
    elev = pm.elevate(jnp.asarray(x), 0.6)
    keys, bary = pm.find_enclosing_simplex(elev)
    keys, bary = np.asarray(keys), np.asarray(bary)

    # Barycentric weights: sum to 1, non-negative (up to rounding).
    np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-4)
    assert (bary > -1e-4).all()

    # Every full key sums to 0 and vertex r has remainder r mod (d+1).
    full = _full_key(keys)  # (N, 4, 4)
    r = np.arange(4)[None, :, None]
    assert ((full - r) % 4 == 0).all()

    # The barycentric combination of the vertices reconstructs the point.
    recon = (bary[..., None] * full).sum(axis=1)
    elev_full = np.asarray(elev)
    np.testing.assert_allclose(recon, elev_full, atol=5e-3)


def test_neighbor_offsets_structure():
    offs = pm.neighbor_offsets(3)
    assert offs.shape == (8, 3)
    # Full offsets (with reconstructed last coordinate) must each be a
    # signed permutation of (1,1,1,-3).
    full = _full_key(offs)
    assert (np.sort(np.abs(full), axis=-1) == np.array([1, 1, 1, 3])).all()
    # +o and -o pairs.
    np.testing.assert_array_equal(offs[:4], -offs[4:])


def test_neighbors_are_lattice_points(rng):
    """key + offset must land on a valid lattice point (uniform remainder)."""
    x = rng.normal(size=(32, 3)).astype(np.float32) * 10
    keys, _ = pm.find_enclosing_simplex(pm.elevate(jnp.asarray(x), 0.6))
    keys = np.asarray(keys).reshape(-1, 3)
    offs = pm.neighbor_offsets(3)
    nbr = keys[:, None, :] + offs[None, :, :]
    full = _full_key(nbr)
    rem = full % 4
    assert (rem == rem[..., :1]).all()
