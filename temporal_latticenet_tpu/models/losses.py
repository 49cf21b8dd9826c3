"""Losses: Lovász-Softmax and NLL, in masked static-shape jnp.

The reference combines them 50/50 on the last frame of each sequence
(``loss = 0.5*LovaszSoftmax + 0.5*NLLLoss``, /root/reference/train_ln.py:119-120,212-216);
the Lovász implementation lives in the external
``latticenet_py.lattice.lovasz_loss`` and follows the standard formulation of
Berman et al., "The Lovasz-Softmax loss" (CVPR 2018), classes='present'.

Static-shape notes: invalid (padded) points and ignore_index points carry
zero weight; per-class error sorting pushes masked entries to the end so the
cumulative-sum Lovász gradient is unaffected by padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nll_loss(logp: jax.Array, targets: jax.Array, mask: jax.Array,
             ignore_index: int = 0) -> jax.Array:
    """Mean negative log-likelihood over valid, non-ignored points
    (torch.nn.NLLLoss(ignore_index) semantics on log-softmax input)."""
    valid = mask & (targets != ignore_index)
    safe_t = jnp.where(valid, targets, 0)
    # one-hot contraction instead of take_along_axis: the gather's VJP is a
    # (P,)-row scatter (~30 ns/row); the one-hot multiply's is elementwise
    # over (P, C) -- ~100x cheaper at SemanticKITTI scale
    oh = (safe_t[:, None] == jnp.arange(logp.shape[1])[None, :])
    picked = jnp.sum(jnp.where(oh, logp, 0.0), axis=1)
    w = valid.astype(logp.dtype)
    return -jnp.sum(picked * w) / jnp.maximum(jnp.sum(w), 1.0)


def _lovasz_grad(gt_sorted: jax.Array) -> jax.Array:
    """Gradient of the Lovasz extension w.r.t. sorted errors (Berman et al.,
    alg. 1).  gt_sorted: (P,) 0/1 foreground indicators in error order."""
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def lovasz_softmax(logp: jax.Array, targets: jax.Array, mask: jax.Array,
                   ignore_index: int = 0) -> jax.Array:
    """Multi-class Lovasz-Softmax over present classes.

    Args:
      logp: (P, C) log-probabilities (the model emits log-softmax).
      targets: (P,) int labels.
      mask: (P,) bool point validity.

    Returns scalar loss (mean over classes present among valid points).
    """
    probs = jnp.exp(logp)
    nc = logp.shape[1]
    valid = mask & (targets != ignore_index)
    vf = valid.astype(logp.dtype)

    def per_class(c):
        fg = (targets == c).astype(logp.dtype) * vf
        errors = jnp.abs(fg - probs[:, c]) * vf
        # masked entries have error 0 and sort last (descending).
        # Sort-only formulation (r5, from the train-step xplane trace): the
        # r3/r4 version gathered errors[order] and fg[order] -- at (26,
        # 131072) those lower to 3.4M SCALAR-row gathers costing ~35 ms
        # EACH per step, plus a ~24 ms scatter VJP (~93 ms total, the bulk
        # of the fwd+loss floor).  Instead the operands RIDE the sort
        # (multi-operand sorts are ~4 ms at this shape, CLAUDE.md), and the
        # detached Lovasz gradient is UNSORTED by a second sort keyed on
        # the carried original indices.  Value is identical (a dot product
        # is permutation-invariant): sum(errors_s * grad) == sum(errors *
        # w) with w = grad unsorted.  Gradient is identical to the
        # reference's torch.dot(errors_sorted, Variable(grad)): d/d
        # errors[j] = grad[position of j] = w[j], the permutation treated
        # as constant (lovasz_losses.py detaches grad).
        iota = jnp.arange(errors.shape[0], dtype=jnp.int32)
        _, fg_s, order = jax.lax.sort((-errors, fg, iota), num_keys=1)
        grad = _lovasz_grad(fg_s)           # constants only -- no grad path
        _, w = jax.lax.sort((order, grad), num_keys=1)
        loss_c = jnp.sum(errors * jax.lax.stop_gradient(w))
        present = jnp.sum(fg) > 0
        return loss_c, present

    losses, present = jax.vmap(per_class)(jnp.arange(nc))
    pw = present.astype(logp.dtype)
    return jnp.sum(losses * pw) / jnp.maximum(jnp.sum(pw), 1.0)


def segmentation_loss(logp, targets, mask, ignore_index: int = 0):
    """The reference's combined loss (train_ln.py:212-216)."""
    l_lov = lovasz_softmax(logp, targets, mask, ignore_index)
    l_nll = nll_loss(logp, targets, mask, ignore_index)
    return 0.5 * l_lov + 0.5 * l_nll, {"lovasz": l_lov, "nll": l_nll}
