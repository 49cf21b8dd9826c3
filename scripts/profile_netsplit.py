"""Per-frame network section costs via early-return cut points.

Non-final frames run the network only up to the LAST active fusion site
(models/lnn_seq.py `_last_active_site`, mirroring the reference's
early_return).  Timing the full 4-frame bench forward with rnn_modules
configured to cut at each site attributes the per-frame sections:

  cut0  pointnet only (early gru)
  cut1  + down-stage level-0 resnets + middle fusion
  cut2  + coarsens + deeper downs + bottleneck + fusion
  cut3  + up path + late fusion (= flagship non-final depth)

The final frame always runs everything, so deltas between variants count
the section 3x (the three non-final frames).  All variants run the bench
protocol (trim, batched pointnet) at bench scale.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()


def timeit(fn, *args, iters=4):
    t0 = time.perf_counter()
    float(fn(*args))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), c


def main():
    from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
    from temporal_latticenet_tpu.data.lidar_like import lidar_sequence
    from temporal_latticenet_tpu.models import LNNSeq, init_state
    from temporal_latticenet_tpu.train.engine import make_sequence_forward

    rt = RuntimeConfig(max_points=131072, capacity_level0=49152,
                       capacity_decay=0.5, min_capacity=8192, sigma=0.6,
                       batched_pointnet=True, trim_capacity_level0=36864)
    rng = np.random.default_rng(0)
    p, v, l, m = lidar_sequence(rng, 4, 131072)
    positions, values, mask = jnp.asarray(p), jnp.asarray(v), jnp.asarray(m)

    variants = [
        ("cut0", ("gru", "none", "none", "none")),
        ("cut1", ("gru", "gru", "none", "none")),
        ("cut2", ("gru", "gru", "aflow", "none")),
        ("cut3", ("gru", "gru", "aflow", "gru")),
    ]
    prev = 0.0
    for name, mods in variants:
        cfg = ModelConfig(nr_classes=26, rnn_modules=mods, frames_per_seq=4)
        model = LNNSeq(cfg, rt)
        seq_fwd = make_sequence_forward(model, cfg, rt)
        init_fn = jax.jit(lambda k, p_, v_, m_, s, mdl=model: mdl.init(
            k, p_, v_, m_, s, final=True))
        variables = init_fn(jax.random.PRNGKey(0), positions[0], values[0],
                            mask[0], init_state(cfg, rt))
        params = {"params": variables["params"]}
        fwd = jax.jit(lambda prm, P, V, M, f=seq_fwd: f(prm, P, V, M)[0].sum())
        t, c = timeit(fwd, params, positions, values, mask)
        print(f"{name}: {t*1e3:8.1f} ms (+{(t-prev)*1e3:7.1f}) "
              f"(compile {c:.0f}s)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
