"""Slow, obviously-correct NumPy oracle for the permutohedral lattice math.

Independent scalar-loop implementation of the classic Adams-Baek-Davis
simplex search, used to validate the vectorised JAX version in
``temporal_latticenet_tpu/ops/permutohedral.py``.
"""

import numpy as np


def elevate_point(x, sigma):
    d = len(x)
    inv_std_dev = np.sqrt(2.0 / 3.0) * (d + 1)
    scale = np.array(
        [inv_std_dev / np.sqrt((j + 1) * (j + 2)) for j in range(d)],
        dtype=np.float64)
    y = np.asarray(x, np.float64) / sigma * scale
    elevated = np.zeros(d + 1)
    sm = 0.0
    for i in range(d, 0, -1):
        cf = y[i - 1]
        elevated[i] = sm - i * cf
        sm += cf
    elevated[0] = sm
    return elevated


def find_simplex_point(elevated):
    """Returns (keys (d+1, d) int, bary (d+1,) float) for one point."""
    dp1 = len(elevated)
    d = dp1 - 1

    rem0 = np.zeros(dp1, np.int64)
    for i in range(dp1):
        v = elevated[i] / dp1
        up = np.ceil(v) * dp1
        down = np.floor(v) * dp1
        rem0[i] = int(up) if up - elevated[i] < elevated[i] - down else int(down)
    sum_g = rem0.sum() // dp1

    rank = np.zeros(dp1, np.int64)
    for i in range(dp1):
        for j in range(i + 1, dp1):
            if elevated[i] - rem0[i] < elevated[j] - rem0[j]:
                rank[i] += 1
            else:
                rank[j] += 1

    rank += sum_g
    for i in range(dp1):
        if rank[i] < 0:
            rank[i] += dp1
            rem0[i] += dp1
        elif rank[i] > d:
            rank[i] -= dp1
            rem0[i] -= dp1

    bary = np.zeros(dp1 + 1)
    for i in range(dp1):
        delta = (elevated[i] - rem0[i]) / dp1
        bary[d - rank[i]] += delta
        bary[d + 1 - rank[i]] -= delta
    bary[0] += 1.0 + bary[dp1]

    keys = np.zeros((dp1, d), np.int64)
    for r in range(dp1):
        for i in range(d):
            keys[r, i] = rem0[i] + r
            if rank[i] > d - r:
                keys[r, i] -= dp1
    return keys, bary[:dp1]
