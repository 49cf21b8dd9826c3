import jax.numpy as jnp
import numpy as np

from temporal_latticenet_tpu.models.losses import (lovasz_softmax, nll_loss,
                                                   segmentation_loss)


def _logp(probs):
    return jnp.log(jnp.asarray(probs, jnp.float32) + 1e-12)


def test_nll_matches_manual(rng):
    p = rng.random((6, 4)).astype(np.float32)
    p /= p.sum(1, keepdims=True)
    t = np.array([1, 2, 3, 0, 1, 2])
    mask = np.array([True, True, True, True, False, True])
    got = float(nll_loss(_logp(p), jnp.asarray(t), jnp.asarray(mask),
                         ignore_index=0))
    valid = [0, 1, 2, 5]  # mask on, target != 0
    want = -np.mean([np.log(p[i, t[i]] + 1e-12) for i in valid])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_lovasz_perfect_prediction_is_zero(rng):
    t = np.array([1, 2, 1, 2, 3])
    p = np.eye(4, dtype=np.float32)[t]
    mask = np.ones(5, bool)
    got = float(lovasz_softmax(_logp(p), jnp.asarray(t), jnp.asarray(mask)))
    assert got < 1e-5


def test_lovasz_orders_predictions(rng):
    t = np.array([1, 1, 2, 2, 2, 1])
    mask = np.ones(6, bool)
    good = np.full((6, 3), 0.05, np.float32)
    good[np.arange(6), t] = 0.9
    bad = np.full((6, 3), 0.4, np.float32)
    bad[np.arange(6), 3 - t] = 0.55  # wrong class confident
    lg = float(lovasz_softmax(_logp(good), jnp.asarray(t), jnp.asarray(mask)))
    lb = float(lovasz_softmax(_logp(bad), jnp.asarray(t), jnp.asarray(mask)))
    assert lg < lb


def test_lovasz_padding_invariance(rng):
    """Padded points must not change the loss."""
    t = np.array([1, 2, 1, 2])
    p = rng.random((4, 3)).astype(np.float32)
    p /= p.sum(1, keepdims=True)

    t_pad = np.concatenate([t, [0, 0]])
    p_pad = np.concatenate([p, rng.random((2, 3)).astype(np.float32)], 0)
    mask = np.array([True] * 4 + [False] * 2)

    a = float(lovasz_softmax(_logp(p), jnp.asarray(t), jnp.ones(4, bool)))
    b = float(lovasz_softmax(_logp(p_pad), jnp.asarray(t_pad), jnp.asarray(mask)))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_combined_loss(rng):
    t = np.array([1, 2, 1])
    p = rng.random((3, 3)).astype(np.float32)
    p /= p.sum(1, keepdims=True)
    mask = np.ones(3, bool)
    total, parts = segmentation_loss(_logp(p), jnp.asarray(t), jnp.asarray(mask))
    np.testing.assert_allclose(float(total),
                               0.5 * float(parts["lovasz"]) + 0.5 * float(parts["nll"]),
                               rtol=1e-6)


def test_lovasz_hard_predictions_equal_one_minus_iou(rng):
    """Known property of the Lovasz extension: for hard (0/1) predictions it
    equals 1 - IoU of the class (Berman et al., prop. 1)."""
    t = np.array([1, 1, 1, 0, 0, 2, 2, 2])
    pred = np.array([1, 1, 2, 0, 1, 2, 2, 2])  # some class-1/2 errors
    p = np.eye(3, dtype=np.float32)[pred]
    mask = np.ones(8, bool)
    # evaluate per class by masking targets to a binary problem
    got = float(lovasz_softmax(_logp(p), jnp.asarray(t), jnp.asarray(mask),
                               ignore_index=-1))

    def iou(c):
        inter = ((pred == c) & (t == c)).sum()
        union = ((pred == c) | (t == c)).sum()
        return inter / union

    want = np.mean([1 - iou(c) for c in [0, 1, 2]])
    np.testing.assert_allclose(got, want, atol=1e-5)
