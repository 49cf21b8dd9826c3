"""Optimiser and LR schedules matching the reference training recipe:
AdamW(amsgrad=True) + CosineAnnealingWarmRestarts or ReduceLROnPlateau
(/root/reference/train_ln.py:181-191,226-227,245-247;
 /root/reference/seq_config/lnn_train_semantic_kitti.cfg:10-14).

optax has no amsgrad-with-decoupled-weight-decay preset, so the amsgrad
moment update is implemented as a custom GradientTransformation and chained
with add_decayed_weights.  The learning rate is injected per step so the
torch scheduler semantics (fractional-epoch cosine restarts stepped every
iteration; plateau-driven reductions decided on the host) carry over.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScaleByAmsgradState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates
    nu_max: optax.Updates


def scale_by_amsgrad(b1=0.9, b2=0.999, eps=1e-8) -> optax.GradientTransformation:
    """torch AdamW(amsgrad=True) moment rule: v_hat = max(v_hat, v)."""

    def init_fn(params):
        z = lambda p: jnp.zeros_like(p)
        return ScaleByAmsgradState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params),
            nu_max=jax.tree_util.tree_map(z, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g,
                                    state.mu, updates)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                    state.nu, updates)
        nu_max = jax.tree_util.tree_map(jnp.maximum, state.nu_max, nu)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        updates = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu_max)
        return updates, ScaleByAmsgradState(count, mu, nu, nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(lr: float, weight_decay: float) -> optax.GradientTransformation:
    """AdamW(amsgrad) with decoupled weight decay; the effective step is
    scaled by the 'lr_scale' hyperparameter injected per update (set from
    the host-side scheduler)."""
    return optax.inject_hyperparams(_make)(lr_scale=1.0, lr=lr,
                                           weight_decay=weight_decay)


def _make(lr_scale, lr, weight_decay):
    return optax.chain(
        scale_by_amsgrad(),
        optax.add_decayed_weights(weight_decay),
        optax.scale(-1.0 * lr * lr_scale),
    )


def cosine_warm_restarts(epoch_frac: float, t0: float, eta_min: float = 0.0) -> float:
    """torch CosineAnnealingWarmRestarts(T_0) stepped with a fractional epoch
    (train_ln.py:226-227): returns a multiplicative scale in (0, 1]."""
    t_cur = math.fmod(epoch_frac, t0)
    return eta_min + (1.0 - eta_min) * (1 + math.cos(math.pi * t_cur / t0)) / 2


class ReduceLROnPlateau:
    """Host-side mirror of torch's ReduceLROnPlateau(patience=10, factor=0.1)
    as configured at train_ln.py:189."""

    def __init__(self, patience: int = 10, factor: float = 0.1,
                 min_scale: float = 1e-8):
        self.patience = patience
        self.factor = factor
        self.min_scale = min_scale
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad_epochs = 0
        return self.scale
