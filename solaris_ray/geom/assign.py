"""Optimal assignment (Hungarian / Jonker–Volgenant) in pure numpy.

scipy is not available in this environment; SCOT's optimal
proposal-to-ground-truth matching
(/root/reference/solaris/eval/scot.py:5-71 uses
``scipy.optimize.linear_sum_assignment``) needs a solver, so this is a
dependency-free shortest-augmenting-path implementation (the same
algorithm family scipy uses).  Maximization is done by negating.

O(n^3); SCOT matrices are per-(aoi, timestep) and small (tens to
hundreds of buildings), so this runs inside a ``map_groups`` kernel.
"""

from __future__ import annotations

import numpy as np


def linear_sum_assignment(cost: np.ndarray, maximize: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Solve min-cost (or max-profit) bipartite assignment.

    Returns (row_idx, col_idx) like scipy; handles rectangular inputs
    by assigning min(n_rows, n_cols) pairs.
    """
    cost = np.asarray(cost, dtype=np.float64)
    if maximize:
        cost = -cost
    transposed = cost.shape[0] > cost.shape[1]
    if transposed:
        cost = cost.T
    n, m = cost.shape  # n <= m
    INF = np.inf
    # potentials and matching (1-based helper arrays, JV style)
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    p = np.zeros(m + 1, dtype=np.int64)  # p[j] = row matched to column j (0 = free)
    way = np.zeros(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = 0
            cur = cost[i0 - 1, :] - u[i0] - v[1:]
            # vectorized relax over unused columns
            unused = ~used[1:]
            cand = np.where(unused, cur, INF)
            upd = cand < minv[1:]
            minv[1:][upd] = cand[upd]
            way[1:][upd] = j0
            masked = np.where(unused, minv[1:], INF)
            j1 = int(np.argmin(masked)) + 1
            delta = masked[j1 - 1]
            used_idx = used.nonzero()[0]
            u[p[used_idx]] += delta
            v[used_idx] -= delta
            minv[1:][unused] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    rows = np.empty(n, dtype=np.int64)
    for j in range(1, m + 1):
        if p[j] > 0:
            rows[p[j] - 1] = j - 1
    ri = np.arange(n)
    if transposed:
        return rows, ri
    return ri, rows
