"""Reverse Cuthill–McKee ordering (bandwidth reduction).

Role equivalent to the reference's `cusolverSpXcsrsymrcmHost` call
(cusparse.c:69-71). BFS from a pseudo-peripheral start node, visiting
neighbors in increasing-degree order, then reverse.

On TPU this is doubly useful: beyond direct-solver fill reduction, RCM
concentrates nonzeros near the diagonal, which densifies the block-sparse
(BSR) layout the Pallas SpMV kernel streams through the MXU/VPU.
"""

from __future__ import annotations

import numpy as np

from lsbench_tpu.matrix.csr import CsrMatrix


def _symmetrized_graph(A: CsrMatrix):
    """Adjacency of A + A^T without self loops, as (offs, cols)."""
    r, c, _ = A.to_coo()
    rr = np.concatenate([r, c])
    cc = np.concatenate([c, r])
    keep = rr != cc
    if not keep.any():  # diagonal matrix: no edges
        return np.zeros(A.nrows + 1, dtype=np.int64), np.zeros(0, dtype=np.int32)
    G = CsrMatrix.from_coo(rr[keep], cc[keep], np.ones(keep.sum()),
                           nrows=A.nrows, ncols=A.nrows)
    return G.offs, G.cols


def _bfs_levels(offs, cols, start, n):
    """BFS level structure; returns (levels, order) with -1 for unreached."""
    level = np.full(n, -1, dtype=np.int64)
    order = np.empty(n, dtype=np.int64)
    level[start] = 0
    order[0] = start
    head, tail = 0, 1
    while head < tail:
        u = order[head]
        head += 1
        nbrs = cols[offs[u]:offs[u + 1]]
        new = nbrs[level[nbrs] < 0]
        if new.size:
            new = np.unique(new)
            level[new] = level[u] + 1
            order[tail:tail + new.size] = new
            tail += new.size
    return level, order[:tail]


def _pseudo_peripheral(offs, cols, component_seed, n):
    """George–Liu style: repeat BFS from a farthest min-degree node."""
    deg = np.diff(offs)
    u = component_seed
    last_ecc = -1
    for _ in range(8):  # converges in a few sweeps
        level, reached = _bfs_levels(offs, cols, u, n)
        ecc = int(level[reached].max())
        if ecc <= last_ecc:
            break
        last_ecc = ecc
        far = reached[level[reached] == ecc]
        u = far[np.argmin(deg[far])]
    return u


def rcm_ordering(A: CsrMatrix) -> np.ndarray:
    """Permutation p: new index i holds old row p[i]."""
    n = A.nrows
    offs, cols = _symmetrized_graph(A)
    deg = np.diff(offs)

    visited = np.zeros(n, dtype=bool)
    out = np.empty(n, dtype=np.int64)
    pos = 0
    # Handle disconnected graphs: loop over components.
    for seed in np.argsort(deg, kind="stable"):
        if visited[seed]:
            continue
        start = _pseudo_peripheral(offs, cols, int(seed), n)
        # Cuthill–McKee: BFS with neighbors in increasing-degree order.
        visited[start] = True
        queue = [int(start)]
        qhead = 0
        while qhead < len(queue):
            u = queue[qhead]
            qhead += 1
            out[pos] = u
            pos += 1
            nbrs = cols[offs[u]:offs[u + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if nbrs.size:
                nbrs = np.unique(nbrs)  # dedupe; keeps determinism
                nbrs = nbrs[np.argsort(deg[nbrs], kind="stable")]
                visited[nbrs] = True
                queue.extend(int(v) for v in nbrs)
    assert pos == n
    return out[::-1].copy()  # reverse CM


def bandwidth(A: CsrMatrix) -> int:
    r, c, _ = A.to_coo()
    return int(np.abs(r - c).max()) if A.nnz else 0
