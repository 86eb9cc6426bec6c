"""Minimum-degree ordering (fill reduction for the direct solver).

Role equivalent to `cusolverSpXcsrsymamdHost` (cusparse.c:72-74) / the
ordering CHOLMOD runs inside `analyze` (cholmod-impl.h:25). This is a greedy
exact minimum-degree on the elimination graph (clique update per pivot) —
simpler than multi-element AMD but producing comparable fill on the
reference-scale workloads (n ≤ ~10^4). Heap entries are lazily invalidated.
"""

from __future__ import annotations

import heapq

import numpy as np

from lsbench_tpu.matrix.csr import CsrMatrix
from lsbench_tpu.ordering.rcm import _symmetrized_graph


def amd_ordering(A: CsrMatrix) -> np.ndarray:
    """Permutation p (new index i holds old row p[i]) by minimum degree.

    Prefers the native APPROXIMATE minimum degree (mindeg.cpp::lsb_amd —
    supervariables + w-pass degrees + element absorption, the
    SuiteSparse-AMD algorithm class CHOLMOD's analyze runs,
    cholmod-impl.h:25): measured 0.5 s at n=262k vs 19-21 s for the
    exact scheme, with ~26% LESS fill (9.06M vs 12.25M on the 512²
    Poisson). Falls back to native exact MD, then pure Python."""
    offs, cols = _symmetrized_graph(A)
    try:
        from lsbench_tpu.native.mindeg import amd_approx
        return amd_approx(offs, cols, A.nrows)
    except Exception:
        pass
    try:
        from lsbench_tpu.native.mindeg import min_degree
        return min_degree(offs, cols, A.nrows)
    except Exception:
        return min_degree_graph(offs, cols, A.nrows)


def min_degree_graph(offs: np.ndarray, cols: np.ndarray, n: int) -> np.ndarray:
    """Minimum-degree ordering of an adjacency graph (no self loops)."""
    adj: list[set[int]] = [set(cols[offs[i]:offs[i + 1]].tolist())
                           for i in range(n)]
    heap = [(len(adj[i]), i) for i in range(n)]
    heapq.heapify(heap)
    eliminated = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    while heap:
        d, u = heapq.heappop(heap)
        if eliminated[u] or d != len(adj[u]):
            continue  # stale entry
        eliminated[u] = True
        order[pos] = u
        pos += 1
        nbrs = adj[u]
        # Eliminating u connects its neighbors into a clique.
        for v in nbrs:
            av = adj[v]
            av.discard(u)
            av |= nbrs
            av.discard(v)
            heapq.heappush(heap, (len(av), v))
        adj[u] = set()
    assert pos == n
    return order
