"""Real-TPU smoke for the r3 Pallas segmented-scan paths.

CPU tests cannot exercise these (``seq_lattice._use_pallas_scans`` gates
them off on the cpu backend; interpret-mode covers semantics only), so
this script checks the actual Mosaic lowering:

  1. kernel-level: sorted_segment_scan modes/dtypes used in production vs
     a NumPy oracle at production-like sizes;
  2. end-to-end: a small flagship forward with TLN_PALLAS_SCANS=1 vs =0
     (the blocked associative-scan fallback) must agree.

Run: python -u scripts/smoke_pallas_r3.py
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

from temporal_latticenet_tpu.ops import pallas_scan as ps


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


def kernel_smoke():
    rng = np.random.default_rng(0)
    q = 1 << 17
    heads = rng.random(q) < 0.02
    heads[0] = True
    hc = np.cumsum(heads).astype(np.int32) - 1
    cases = [(4, "sum", np.float32), (1, "sum", np.int32),
             (1, "first", np.int32), (128, "first", np.float32),
             (64, "sum", np.float32)]
    for c, mode, dtype in cases:
        if dtype == np.float32:
            x = rng.standard_normal((q, c)).astype(dtype)
        else:
            x = rng.integers(0, 1000, (q, c)).astype(dtype)
        out = jax.jit(lambda h, v: ps.sorted_segment_scan(h, v, mode))(
            jnp.asarray(hc), jnp.asarray(x))
        ref = _oracle(hc, x, mode)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2)
        print(f"kernel ok: c={c} mode={mode} dtype={dtype.__name__}",
              flush=True)


def forward_smoke():
    from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
    from temporal_latticenet_tpu.data.lidar_like import lidar_sequence
    from temporal_latticenet_tpu.models import LNNSeq, init_state
    from temporal_latticenet_tpu.train.engine import make_sequence_forward

    T = 4
    max_pts = 16384
    rt = RuntimeConfig(max_points=max_pts, capacity_level0=8192,
                       capacity_decay=0.5, min_capacity=2048, sigma=0.6)
    cfg = ModelConfig(nr_classes=26,
                      rnn_modules=("gru", "gru", "aflow", "gru"),
                      frames_per_seq=T)
    rng = np.random.default_rng(0)
    p, v, l, m = lidar_sequence(rng, T, max_pts)
    P, V, M = jnp.asarray(p), jnp.asarray(v), jnp.asarray(m)

    model = LNNSeq(cfg, rt)
    init_fn = jax.jit(lambda k, p_, v_, m_, s: model.init(
        k, p_, v_, m_, s, final=True))
    variables = init_fn(jax.random.PRNGKey(0), P[0], V[0], M[0],
                        init_state(cfg, rt))
    params = {"params": variables["params"]}
    seq_fwd = make_sequence_forward(model, cfg, rt)

    outs = {}
    for flag in ("1", "0"):
        os.environ["TLN_PALLAS_SCANS"] = flag
        fn = jax.jit(lambda prm, P_, V_, M_: seq_fwd(prm, P_, V_, M_)[0])
        outs[flag] = np.asarray(fn(params, P, V, M))
        print(f"forward ok: TLN_PALLAS_SCANS={flag} "
              f"logp sum={outs[flag].sum():.4f}", flush=True)
    diff = np.abs(outs["1"] - outs["0"]).max()
    print(f"max |logp_pallas - logp_fallback| = {diff:.3e}", flush=True)
    assert diff < 5e-2, diff


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    kernel_smoke()
    forward_smoke()
    print("SMOKE PASS", flush=True)
