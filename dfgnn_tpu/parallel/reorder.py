"""Locality-aware node reordering for graph partitioning.

Contiguous row-block partitioning (``partition_graph``) produces O(halo)
communication only if neighboring nodes get nearby ids.  This module
computes a cheap BFS-based permutation (Cuthill-McKee family) that
concentrates each community's nodes into a contiguous id range, so the
``halo=True`` exchange beats the all-gather on clustered graphs (reddit
and friends; on locality-free random graphs no ordering helps and the
halo degenerates to all-of-peer — measured and documented).

Host-side numpy; O(V + E).
"""

from __future__ import annotations

import numpy as np


def bfs_reorder(rows: np.ndarray, cols: np.ndarray, n: int,
                *, by_degree: bool = True) -> np.ndarray:
    """Return ``perm`` (old node ids in visit order): BFS over the
    undirected edge set, starting each component at its lowest-degree
    node (classic Cuthill-McKee seed choice).

    ``x_new = x_old[perm]``; the inverse rank is ``argsort(perm)``.
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    # symmetrized CSR for traversal
    r2 = np.concatenate([rows, cols])
    c2 = np.concatenate([cols, rows])
    order = np.argsort(r2, kind="stable")
    r2, c2 = r2[order], c2[order]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, r2 + 1, 1)
    indptr = np.cumsum(indptr)
    deg = np.diff(indptr)

    visited = np.zeros(n, bool)
    perm = np.empty(n, np.int64)
    pos = 0
    seeds = np.argsort(deg, kind="stable") if by_degree else np.arange(n)
    frontier = np.empty(n, np.int64)
    for seed in seeds:
        if visited[seed]:
            continue
        visited[seed] = True
        frontier[0] = seed
        lo, hi = 0, 1
        while lo < hi:
            u = frontier[lo]
            lo += 1
            perm[pos] = u
            pos += 1
            nbrs = c2[indptr[u]:indptr[u + 1]]
            new = nbrs[~visited[nbrs]]
            if new.size:
                new = np.unique(new)
                visited[new] = True
                frontier[hi:hi + new.size] = new
                hi += new.size
    assert pos == n
    return perm


def lpa_reorder(rows: np.ndarray, cols: np.ndarray, n: int,
                iters: int = 5) -> np.ndarray:
    """Label-propagation community ordering: each sweep sets every node's
    label to the mode of its neighbors' labels (vectorized via sorted
    run-length counting), then nodes are ordered by final label.  Recovers
    planted communities on SBM-like graphs where plain BFS interleaves them
    through cross edges.  O(iters * E log E) host-side."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    r2 = np.concatenate([rows, cols])
    c2 = np.concatenate([cols, rows])
    labels = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        key = r2 * (n + 1) + labels[c2]
        ks = np.sort(key)
        boundary = np.nonzero(np.diff(ks))[0] + 1
        starts = np.concatenate([[0], boundary])
        ends = np.concatenate([boundary, [len(ks)]])
        counts = ends - starts
        run_node = ks[starts] // (n + 1)
        run_label = ks[starts] % (n + 1)
        # per node: label of the max-count run (ties -> larger label)
        order2 = np.lexsort((run_label, counts, run_node))
        rn = run_node[order2]
        last = np.nonzero(np.r_[rn[1:] != rn[:-1], [True]])[0]
        new = labels.copy()
        new[rn[last]] = run_label[order2][last]
        if np.array_equal(new, labels):
            break
        labels = new
    return np.argsort(labels, kind="stable")


def reorder_graph(rows, cols, n, perm):
    """Relabel edges under ``perm`` (old ids in new order).  Returns
    (new_rows, new_cols, rank) with ``rank[old] = new``."""
    rank = np.empty(n, np.int64)
    rank[perm] = np.arange(n)
    return rank[np.asarray(rows)], rank[np.asarray(cols)], rank
