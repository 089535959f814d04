"""Shared test utilities: random graphs + a plain-numpy ground truth."""

import numpy as np

from dfgnn_tpu.graph import Graph


def random_graph_coo(rng, n, avg_deg, *, super_node_deg=0, with_val=False, zero_deg_frac=0.1):
    """Random COO edges with some zero-degree rows and optionally one
    super-node row.  Returns (rows, cols, val|None)."""
    rows_list = []
    cols_list = []
    n_zero = int(n * zero_deg_frac)
    active = np.arange(n_zero, n)
    for r in active:
        d = max(1, int(rng.poisson(avg_deg)))
        cols = rng.integers(0, n, size=d)
        cols = np.unique(cols)
        rows_list.append(np.full(cols.shape, r))
        cols_list.append(cols)
    if super_node_deg:
        cols = rng.choice(n, size=min(super_node_deg, n), replace=False)
        rows_list.append(np.full(cols.shape, n_zero))
        cols_list.append(cols)
    rows = np.concatenate(rows_list)
    cols = np.concatenate(cols_list)
    # dedupe (row, col) pairs
    key = rows.astype(np.int64) * n + cols
    _, idx = np.unique(key, return_index=True)
    rows, cols = rows[idx], cols[idx]
    val = rng.standard_normal(rows.shape[0]).astype(np.float32) if with_val else None
    return rows, cols, val


def make_graph(rng, n, avg_deg, **kw) -> Graph:
    rows, cols, val = random_graph_coo(rng, n, avg_deg, **kw)
    return Graph.from_coo(rows, cols, n, val=val)


def numpy_attention(
    rows, cols, n, v, *, q=None, k=None, e_row=None, e_col=None,
    val=None, score="dot", negative_slope=0.2,
):
    """Dense numpy ground truth for row-softmax attention aggregation.

    v: [n, h, f]; q/k: [n, h, f]; e_row/e_col: [n, h].  Returns [n, h, f].
    """
    h = v.shape[1]
    f = v.shape[2]
    out = np.zeros((n, h, f), dtype=np.float64)
    v = v.astype(np.float64)
    for hh in range(h):
        S = np.full((n, n), -np.inf)
        for e in range(len(rows)):
            r, c = rows[e], cols[e]
            if score == "dot":
                s = float(np.dot(q[r, hh].astype(np.float64), k[c, hh].astype(np.float64)))
            else:
                s = e_row[r, hh] + e_col[c, hh]
                s = s if s >= 0 else s * negative_slope
            if val is not None:
                s *= val[e]
            S[r, c] = s
        for r in range(n):
            m = S[r].max()
            if m == -np.inf:
                continue
            ex = np.where(np.isinf(S[r]), 0.0, np.exp(S[r] - m))
            den = ex.sum()
            if den == 0:
                continue
            out[r, hh] = (ex / den) @ v[:, hh, :]
    return out.astype(np.float32)
