import jax
import jax.numpy as jnp
import numpy as np

from temporal_latticenet_tpu.ops.mxu_lookup import mxu_lookup_positions
from temporal_latticenet_tpu.ops.vertex_table import PACKED_SENTINEL


def _table(rng, n_real, cap):
    vals = np.sort(rng.choice(np.uint32(2**31), n_real, replace=False).astype(np.uint32))
    table = np.full(cap, PACKED_SENTINEL, np.uint32)
    table[:n_real] = vals
    return table, vals


def test_mxu_lookup_hits_and_misses(rng):
    cap = 1024
    table, vals = _table(rng, 700, cap)
    q_hit = vals[rng.integers(0, 700, 500)]
    q_miss = q_hit ^ np.uint32(1)
    q_pad = np.full(50, PACKED_SENTINEL, np.uint32)
    q = np.concatenate([q_hit, q_miss, q_pad])

    got = np.asarray(mxu_lookup_positions(jnp.asarray(table), jnp.asarray(q),
                                          chunk=256))
    want_pos = np.searchsorted(table, q)
    want_pos = np.minimum(want_pos, cap - 1)
    want = np.where((table[want_pos] == q) & (q != PACKED_SENTINEL),
                    want_pos, -1)
    np.testing.assert_array_equal(got, want)


def test_mxu_lookup_edge_entries(rng):
    cap = 512
    table, vals = _table(rng, 512, cap)  # completely full
    q = np.array([vals[0], vals[-1], vals[127], vals[128], vals[255],
                  vals[256]], np.uint32)
    got = np.asarray(mxu_lookup_positions(jnp.asarray(table), jnp.asarray(q),
                                          chunk=128))
    np.testing.assert_array_equal(got, [0, 511, 127, 128, 255, 256])


def test_mxu_lookup_large_random(rng):
    cap = 8192
    table, vals = _table(rng, 6000, cap)
    q = rng.choice(np.uint32(2**31), 20000).astype(np.uint32)
    got = np.asarray(mxu_lookup_positions(jnp.asarray(table), jnp.asarray(q)))
    want_pos = np.minimum(np.searchsorted(table, q), cap - 1)
    want = np.where(table[want_pos] == q, want_pos, -1)
    np.testing.assert_array_equal(got, want)


def test_mxu_lookup_select_payloads(rng):
    """Payload byte-planes selected through the one-hot contraction must
    equal a plain gather at the hit position (and 0 at misses)."""
    from temporal_latticenet_tpu.ops.mxu_lookup import mxu_lookup_select

    c, qn = 1024, 3000
    table = np.sort(rng.choice(2**31, c, replace=False).astype(np.uint32))
    stable = rng.integers(0, 2**17, c).astype(np.int32)
    birth = rng.integers(0, 8, c).astype(np.int32)
    q = np.concatenate([rng.choice(table, qn // 2),
                        rng.integers(0, 2**31, qn - qn // 2).astype(np.uint32)])
    pos, (st, bi) = jax.jit(lambda t, qq, s, b: mxu_lookup_select(
        t, qq, payloads=(s, b), payload_bits=(17, 3), chunk=512))(
            jnp.asarray(table), jnp.asarray(q), jnp.asarray(stable),
            jnp.asarray(birth))
    pos, st, bi = map(np.asarray, (pos, st, bi))

    idx = np.searchsorted(table, q)
    hit = (idx < c) & (table[np.minimum(idx, c - 1)] == q)
    np.testing.assert_array_equal(pos, np.where(hit, idx, -1))
    np.testing.assert_array_equal(st, np.where(hit, stable[np.minimum(idx, c - 1)], 0))
    np.testing.assert_array_equal(bi, np.where(hit, birth[np.minimum(idx, c - 1)], 0))
