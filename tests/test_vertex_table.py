import jax
import jax.numpy as jnp
import numpy as np

from temporal_latticenet_tpu.ops import vertex_table as vt


def _keys(rows):
    return jnp.asarray(np.array(rows, np.int32))


def test_empty_table_lookup():
    t = vt.make_table(16, 3)
    q = _keys([[0, 0, 0], [1, 2, 3]])
    idx = vt.lookup(t, q)
    assert (np.asarray(idx) == -1).all()


def test_union_assigns_and_finds():
    t = vt.make_table(16, 3)
    cand = _keys([[1, 1, 1], [2, 2, 2], [1, 1, 1], [3, 3, 3]])
    valid = jnp.array([True, True, True, True])
    t, idx = vt.union_and_index(t, cand, valid)
    idx = np.asarray(idx)
    # duplicates share an index; indices start at 1 (slot 0 reserved)
    assert idx[0] == idx[2]
    assert len({idx[0], idx[1], idx[3]}) == 3
    assert (idx > 0).all()
    assert int(t.count) == 4  # 3 keys + reserved slot

    # lookup finds the same stable indices
    got = np.asarray(vt.lookup(t, cand))
    np.testing.assert_array_equal(got, idx)


def test_union_append_only_stability():
    """Indices of existing keys never change across unions (the temporal
    invariant of models.py:286-289)."""
    t = vt.make_table(32, 3)
    first = _keys([[5, 0, -5], [1, 2, 3]])
    t, idx1 = vt.union_and_index(t, first, jnp.ones(2, bool))

    second = _keys([[1, 2, 3], [9, 9, 9], [5, 0, -5], [7, 7, 7]])
    t, idx2 = vt.union_and_index(t, second, jnp.ones(4, bool))
    idx1, idx2 = np.asarray(idx1), np.asarray(idx2)
    assert idx2[0] == idx1[1]
    assert idx2[2] == idx1[0]
    # new keys appended after the old ones
    assert idx2[1] > idx1.max() and idx2[3] > idx1.max()
    assert int(t.count) == 5


def test_union_invalid_rows_map_to_zero():
    t = vt.make_table(16, 3)
    cand = _keys([[1, 1, 1], [2, 2, 2]])
    valid = jnp.array([True, False])
    t, idx = vt.union_and_index(t, cand, valid)
    idx = np.asarray(idx)
    assert idx[1] == 0
    assert np.asarray(vt.lookup(t, _keys([[2, 2, 2]])))[0] == -1


def test_union_overflow_maps_to_zero():
    t = vt.make_table(4, 3)  # slot0 + 3 usable
    cand = _keys([[i, i, i] for i in range(1, 7)])
    t, idx = vt.union_and_index(t, cand, jnp.ones(6, bool))
    idx = np.asarray(idx)
    assert int(t.count) == 4
    assert (idx == 0).sum() == 3  # three dropped
    assert len(set(idx[idx > 0])) == 3


def test_union_under_jit_matches_eager(rng):
    t0 = vt.make_table(64, 3)
    cand = jnp.asarray(rng.integers(-3, 3, size=(40, 3)).astype(np.int32))
    valid = jnp.asarray(rng.random(40) > 0.2)

    t1, idx1 = vt.union_and_index(t0, cand, valid)
    t2, idx2 = jax.jit(vt.union_and_index)(t0, cand, valid)
    np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))
    np.testing.assert_array_equal(np.asarray(t1.keys), np.asarray(t2.keys))
    assert int(t1.count) == int(t2.count)


def test_lookup_random_fuzz(rng):
    t = vt.make_table(512, 3)
    keys = rng.integers(-50, 50, size=(300, 3)).astype(np.int32)
    t, idx = vt.union_and_index(t, jnp.asarray(keys), jnp.ones(300, bool))
    idx = np.asarray(idx)

    # every inserted key must be found at its assigned index
    got = np.asarray(vt.lookup(t, jnp.asarray(keys)))
    np.testing.assert_array_equal(got, idx)

    # keys never inserted are not found
    missing = rng.integers(100, 200, size=(50, 3)).astype(np.int32)
    assert (np.asarray(vt.lookup(t, jnp.asarray(missing))) == -1).all()
