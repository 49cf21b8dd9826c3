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
