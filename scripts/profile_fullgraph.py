"""Full-graph ablation profiling.

Per-op timing through the remote-TPU tunnel is floored at ~35 ms dispatch
overhead (see scripts/profile_gather.py results), so stage costs are
measured as DELTAS between one-dispatch programs that each run a prefix of
the real per-sequence pipeline at bench scale:

  dist4      4 frames of distribute/union (table building only)
  nbr4       + level-0 neighbor table per frame
  grow4      + coarse level growth (2 levels) + their neighbor tables
  trim4      4 frames of the real trimmed model body (early_return path)
  full       the real sequence forward (3 trimmed + 1 final)
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp


def timeit(fn, *args, iters=3):
    fn(*args)  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jax.tree_util.tree_leaves(fn(*args))[0].sum())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=120_000)
    ap.add_argument("--capacity", type=int, default=65_536)
    args = ap.parse_args()

    from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
    from temporal_latticenet_tpu.data.synthetic import synthetic_sequence
    from temporal_latticenet_tpu.models import LNNSeq, init_state
    from temporal_latticenet_tpu.ops import lattice_ops as lo
    from temporal_latticenet_tpu.train.engine import make_sequence_forward

    max_pts = 131072
    rt = RuntimeConfig(max_points=max_pts, capacity_level0=args.capacity,
                       capacity_decay=0.75, min_capacity=8192, sigma=0.6)
    cfg = ModelConfig(nr_classes=26, rnn_modules=("gru", "gru", "aflow", "gru"),
                      frames_per_seq=4)

    rng = np.random.default_rng(0)
    p, v, l, m = synthetic_sequence(rng, 4, args.points, max_pts)
    P, V, M = jnp.asarray(p), jnp.asarray(v), jnp.asarray(m)

    caps = rt.capacities(cfg.nr_downsamples)

    from temporal_latticenet_tpu.ops import vertex_table as vt

    @jax.jit
    def dist4(P, M):
        t = vt.make_table(caps[0], 3)
        def body(t, inp):
            pos, msk = inp
            t, out = lo.distribute(t, pos, msk, rt.sigma)
            return t, out.row_bary.sum()
        t, s = jax.lax.scan(body, t, (P, M))
        return s

    @jax.jit
    def nbr4(P, M):
        t = vt.make_table(caps[0], 3)
        def body(t, inp):
            pos, msk = inp
            t, out = lo.distribute(t, pos, msk, rt.sigma)
            nbr = lo.build_neighbor_table(t)
            return t, nbr.idx.sum()
        t, s = jax.lax.scan(body, t, (P, M))
        return s

    @jax.jit
    def grow4(P, M):
        t0 = vt.make_table(caps[0], 3)
        t1 = vt.make_table(caps[1], 3)
        t2 = vt.make_table(caps[2], 3)
        def body(carry, inp):
            t0, t1, t2 = carry
            pos, msk = inp
            t0, out = lo.distribute(t0, pos, msk, rt.sigma)
            n0 = lo.build_neighbor_table(t0)
            t1, l1 = lo.grow_coarse_table(t0, t1)
            n1 = lo.build_neighbor_table(t1)
            t2, l2 = lo.grow_coarse_table(t1, t2)
            n2 = lo.build_neighbor_table(t2)
            s = n0.idx.sum() + n1.idx.sum() + n2.idx.sum() + l1.corner_idx.sum()
            return (t0, t1, t2), s
        _, s = jax.lax.scan(body, (t0, t1, t2), (P, M))
        return s

    model = LNNSeq(cfg, rt)
    init_fn = jax.jit(lambda k: model.init(
        k, P[0], V[0], M[0], init_state(cfg, rt), final=True))
    params = init_fn(jax.random.PRNGKey(0))

    @jax.jit
    def trim4(prm, P, V, M):
        state = init_state(cfg, rt)
        def body(carry, inp):
            pos, val, msk = inp
            _, carry, _ = model.apply(prm, pos, val, msk, carry, final=False)
            return carry, ()
        state, _ = jax.lax.scan(body, state, (P, V, M))
        return state.h[0].sum()

    seq_fwd = make_sequence_forward(model, cfg, rt)
    full = jax.jit(lambda prm, P_, V_, M_: seq_fwd(prm, P_, V_, M_)[0].sum())

    results = {}
    for name, fn, a in [
        ("dist4", dist4, (P, M)),
        ("nbr4", nbr4, (P, M)),
        ("grow4", grow4, (P, M)),
        ("trim4", trim4, (params, P, V, M)),
        ("full", full, (params, P, V, M)),
    ]:
        t0 = time.perf_counter()
        results[name] = timeit(fn, *a)
        print(f"{name:6s}: {results[name]*1e3:9.1f} ms   "
              f"(compile+3 iters took {time.perf_counter()-t0:.0f}s)",
              flush=True)

    print("\nDeltas:")
    print(f"  neighbor tables L0 : {(results['nbr4']-results['dist4'])*1e3:9.1f} ms")
    print(f"  coarse grow + nbrs : {(results['grow4']-results['nbr4'])*1e3:9.1f} ms")
    print(f"  network compute    : {(results['trim4']-results['grow4'])*1e3:9.1f} ms (approx)")
    print(f"  final-frame extra  : {(results['full']-results['trim4'])*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
