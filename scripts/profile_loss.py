"""Price the segmentation loss's forward+backward at SemanticKITTI scale.

The backward profiler (profile_backward.py) found a 508 ms train-step floor
vs a ~184 ms synced forward; the suspect is the loss backward (26 per-class
argsort-gathers whose default VJP scatters P rows each).  This micro-graph
times grad-of-loss w.r.t. logits for (a) the shipped implementation and
(b) a variant with naive x[order] / take_along_axis gathers, each as a
small standalone jit -- compiles in seconds, so the A/B is cheap.

MEASURED (r3, real TPU): a permutation-gather VJP (inv=argsort(order),
backward dg[inv]) was 106.9 ms vs 90.1 ms for the naive scatter VJP --
the 26 vmapped 1-channel scatters batch well and cost LESS than the extra
26xP argsort, so losses.py keeps the plain gather.  Both numbers include
the ~31 ms dispatch floor: the whole loss fwd+bwd is ~60-75 ms real, far
short of the 508 ms train-step floor -- the rest lives in the vmap/grad
machinery (see profile_backward.py's fwd+loss variant).

Run on the real TPU: python -u scripts/profile_loss.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

from temporal_latticenet_tpu.models import losses

P, C = 131072, 26


def naive_lovasz(logp, targets, mask, ignore_index=0):
    probs = jnp.exp(logp)
    valid = mask & (targets != ignore_index)
    vf = valid.astype(logp.dtype)

    def per_class(c):
        fg = (targets == c).astype(logp.dtype) * vf
        errors = jnp.abs(fg - probs[:, c]) * vf
        order = jnp.argsort(-errors)
        errors_s = errors[order]          # scatter-add VJP
        fg_s = fg[order]
        grad = losses._lovasz_grad(fg_s)
        loss_c = jnp.sum(errors_s * grad)
        return loss_c, jnp.sum(fg) > 0

    lo, present = jax.vmap(per_class)(jnp.arange(C))
    pw = present.astype(logp.dtype)
    return jnp.sum(lo * pw) / jnp.maximum(jnp.sum(pw), 1.0)


def naive_nll(logp, targets, mask, ignore_index=0):
    valid = mask & (targets != ignore_index)
    safe_t = jnp.where(valid, targets, 0)
    picked = jnp.take_along_axis(logp, safe_t[:, None], axis=1)[:, 0]
    w = valid.astype(logp.dtype)
    return -jnp.sum(picked * w) / jnp.maximum(jnp.sum(w), 1.0)


def main():
    rng = np.random.default_rng(0)
    sv = jnp.asarray(rng.normal(size=(P, C)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, C, size=P).astype(np.int32))
    mask = jnp.asarray(rng.random(P) < 0.9)

    def shipped(sv_):
        logp = jax.nn.log_softmax(sv_, axis=-1)
        l, _ = losses.segmentation_loss(logp, targets, mask, 0)
        return l

    def naive(sv_):
        logp = jax.nn.log_softmax(sv_, axis=-1)
        return 0.5 * naive_lovasz(logp, targets, mask) + \
            0.5 * naive_nll(logp, targets, mask)

    for label, fn in (("shipped", shipped), ("naive", naive)):
        g = jax.jit(jax.grad(fn))
        t0 = time.perf_counter()
        out = g(sv)
        gsum = float(out.sum())
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(g(sv + 1e-12).sum())
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"variant": label, "ms": round(min(ts) * 1e3, 2),
                          "compile_s": round(compile_s, 1),
                          "grad_sum": round(gsum, 6)}), flush=True)

    # numeric equivalence of the two VJPs
    ga = jax.jit(jax.grad(shipped))(sv)
    gb = jax.jit(jax.grad(naive))(sv)
    err = float(jnp.max(jnp.abs(ga - gb)))
    print(json.dumps({"max_abs_grad_diff": err}), flush=True)


if __name__ == "__main__":
    main()
