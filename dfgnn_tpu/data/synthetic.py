"""Synthetic graph generators.

Role of the reference's ``DFGNN/utils/graph_generate.py`` (constant-degree
random graphs, :21-27) and its GraphWorld SBM benchmark pickles
(``script/test/test_gt_graphworld.py``): everything is testable and
benchmarkable with zero dataset downloads.  Scale anchors follow the
reference's measured statistics (``figure/graph_statistics/
graph_statistics.md``): PATTERN ~119 nodes deg~51, MNIST 70 deg 8,
CIFAR10 117 deg 8, molhiv ~25 deg~2.
"""

from __future__ import annotations

import numpy as np


def constant_degree_graph(rng, n: int, deg: int):
    """Every node has exactly ``deg`` out-edges to uniform targets
    (parity: ``graph_generate.py:21-27``).  Returns (rows, cols)."""
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, size=n * deg)
    return rows, cols


def sbm_graph(rng, n: int, n_blocks: int = 2, avg_deg: float = 51.0,
              p_ratio: float = 4.0):
    """Stochastic-block-model graph (GraphWorld / PATTERN style).

    ``p_ratio`` = intra/inter block edge-probability ratio.  Returns
    (rows, cols) with symmetric edges.
    """
    block = rng.integers(0, n_blocks, size=n)
    # solve p_intra from expected degree: deg = p_in*(n/b) + p_out*n*(b-1)/b
    nb = n / n_blocks
    p_out = avg_deg / (nb * p_ratio + (n - nb))
    p_in = p_out * p_ratio
    rows_l, cols_l = [], []
    same = block[:, None] == block[None, :]
    probs = np.where(same, p_in, p_out)
    upper = np.triu(rng.random((n, n)) < probs, k=1)
    r, c = np.nonzero(upper)
    rows = np.concatenate([r, c])
    cols = np.concatenate([c, r])
    return rows, cols, block


def pattern_like_batch(rng, n_graphs: int, mean_nodes: int = 119,
                       avg_deg: float = 51.0):
    """Batch of SBM graphs shaped like the PATTERN workload.

    Returns list of (rows, cols, n_nodes, node_labels) — labels are the SBM
    block ids (PATTERN's task is recognising the planted pattern; block ids
    give a comparable node-classification target).
    """
    out = []
    for _ in range(n_graphs):
        n = int(np.clip(rng.normal(mean_nodes, 15), 40, 128))
        deg = min(avg_deg, n - 1)
        rows, cols, block = sbm_graph(rng, n, avg_deg=deg)
        out.append((rows, cols, n, block))
    return out


def small_graph_batch(rng, n_graphs: int, mean_nodes: int = 70, deg: int = 8,
                      max_nodes: int = 128):
    """MNIST/CIFAR10-style batch: k-regular-ish sparse graphs."""
    out = []
    for _ in range(n_graphs):
        n = int(np.clip(rng.normal(mean_nodes, mean_nodes / 8), 10, max_nodes))
        rows, cols = constant_degree_graph(rng, n, min(deg, n - 1))
        out.append((rows, cols, n, None))
    return out


def community_graph(rng, n: int, n_communities: int, avg_deg: float = 10.0,
                    intra_frac: float = 0.9):
    """Locality-structured full graph: nodes are grouped into contiguous
    communities and each edge lands inside its source's community with
    probability ``intra_frac`` (reddit-like community structure; the halo
    of a contiguous partition is then O(inter-community edges), which is
    what the ``HaloExchange`` path exploits).  Returns (rows, cols)."""
    deg = np.maximum(rng.poisson(avg_deg, size=n), 1)
    rows = np.repeat(np.arange(n), deg)
    E = int(deg.sum())
    csize = -(-n // n_communities)
    com_lo = (rows // csize) * csize
    com_hi = np.minimum(com_lo + csize, n)
    intra = rng.random(E) < intra_frac
    local = com_lo + rng.integers(0, csize, size=E) % (com_hi - com_lo)
    remote = rng.integers(0, n, size=E)
    cols = np.where(intra, local, remote)
    return rows, cols


def power_law_graph(rng, n: int, avg_deg: float = 10.0, alpha: float = 1.8,
                    max_deg_frac: float = 0.1):
    """Full graph with power-law in-row degrees — the reddit/super-node
    regime (single rows with 1e4+ neighbors) that exercises the tiling
    path.  Returns (rows, cols)."""
    raw = rng.pareto(alpha, size=n) + 1.0
    deg = np.minimum((raw / raw.mean() * avg_deg).astype(np.int64),
                     int(n * max_deg_frac))
    deg = np.maximum(deg, 1)
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, size=int(deg.sum()))
    return rows, cols
