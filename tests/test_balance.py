"""Degree-balanced partitioning + globally-dealt shared segments
(VERDICT r4 item 1: the harmonized-padding growth fix).

Covers: balance_perm structure, padding-growth containment on a
power-law graph, shared-segment forward/grad/dropout correctness vs the
single-chip oracle, and the perm-aware dropout hash.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfgnn_tpu import formats
from dfgnn_tpu.graph import Graph
from dfgnn_tpu.ops import graph_attention
from dfgnn_tpu.ops.bucket import bucket_graph_attention
from dfgnn_tpu.parallel.balance import balance_perm
from dfgnn_tpu.parallel import make_mesh
from dfgnn_tpu.parallel.partition import (
    _plan_widths, dist_graph_attention, partition_graph,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.fixture
def mesh8():
    return make_mesh(8)


def _power_law_graph(rng, n=2048, e_bg=8192, supers=((5, 900), (77, 500))):
    rows = [rng.integers(0, n, e_bg)]
    cols = [rng.integers(0, n, e_bg)]
    for r, deg in supers:
        rows.append(np.full(deg, r))
        cols.append(rng.integers(0, n, deg))
    return Graph.from_coo(
        np.concatenate(rows).astype(np.int32),
        np.concatenate(cols).astype(np.int32), n)


def test_balance_perm_structure(rng):
    n, P = 999, 8
    deg = rng.integers(0, 40, n).astype(np.int64)
    deg[rng.choice(n, 5, replace=False)] = 300  # wide rows
    widths, use_seg = _plan_widths(deg, 8, 256, None)
    perm = balance_perm(deg, P, widths, 256, use_seg)
    # bijection
    assert sorted(perm.tolist()) == list(range(n))
    # per-class per-device counts within 1 of each other
    n_local = -(-n // P)
    cls = np.searchsorted(widths, deg[perm])
    cls[deg[perm] == 0] = -1
    for c in np.unique(cls):
        counts = [
            int((cls[d * n_local : (d + 1) * n_local] == c).sum())
            for d in range(P)
        ]
        # the short tail device may be low; the rest must be tight
        assert max(counts) - min(counts[:-1]) <= 2, (c, counts)


def test_balance_contains_padding_growth(rng):
    """Padded-edge factor at high P stays within 25% of the low-P factor
    (the r4 measurement without balance grew 76% over the same range).
    Needs n >> P * max_width so per-class device shares are populated —
    the regime the partitioner targets (reddit: n = 233k)."""
    n = 16384
    deg_tail = rng.pareto(1.3, n).astype(np.int64) + 2  # power-law degrees
    deg_tail = np.minimum(deg_tail, 2000)
    rows = np.repeat(np.arange(n), deg_tail)
    cols = rng.integers(0, n, rows.size)
    g = Graph.from_coo(rows.astype(np.int32), cols.astype(np.int32), n)
    e = g.n_edges
    pads = {}
    for P in (4, 32):
        pg = partition_graph(g, P, balance=True)
        pads[P] = pg.padded_edges / e
    assert pads[32] <= pads[4] * 1.25, pads
    # and balance must not be worse than no-balance at high P
    pg_nb = partition_graph(g, 32, balance=False)
    assert pads[32] <= pg_nb.padded_edges / e + 1e-9


def test_shared_segments_built_and_padding(rng):
    g = _power_law_graph(rng)
    pg = partition_graph(g, 8, split_width=256)
    assert pg.shared_segments is not None and pg.segments is None
    ss = pg.shared_segments
    assert ss.nbr.shape[0] == 8
    # shared scheme: total padded segments within one 8-row round-up per
    # device of the real count
    assert ss.nbr.shape[1] * 8 <= ss.n_segments + 8 * 8
    # halo / with_transpose keep the per-device scheme
    pg_t = partition_graph(g, 8, split_width=256, with_transpose=True)
    assert pg_t.shared_segments is None and pg_t.segments is not None


def test_shared_segments_match_oracle(rng, mesh8):
    g = _power_law_graph(rng)
    n = g.n_nodes
    q, k, v = (jnp.asarray(rng.standard_normal((n, 2, 16)).astype(np.float32))
               for _ in range(3))
    ref = graph_attention(g, q, k, v, score="dot", method="reference")
    pg = partition_graph(g, 8, split_width=256)
    assert pg.shared_segments is not None
    out = dist_graph_attention(pg, mesh8, q, k, v, score="dot")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # add-score path over the same shared layout
    er = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    ec = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    ref2 = graph_attention(g, None, None, v, score="add", e_row=er,
                           e_col=ec, method="reference")
    out2 = dist_graph_attention(pg, mesh8, None, None, v, score="add",
                                e_row=er, e_col=ec)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-4, atol=1e-4)


def test_shared_segments_grads(rng, mesh8):
    g = _power_law_graph(rng, n=1024, e_bg=4096, supers=((3, 700),))
    n = g.n_nodes
    q, k, v = (jnp.asarray(rng.standard_normal((n, 1, 16)).astype(np.float32))
               for _ in range(3))
    t = jnp.asarray(rng.standard_normal((n, 1, 16)).astype(np.float32))
    pg = partition_graph(g, 8, split_width=256)
    assert pg.shared_segments is not None

    f_ref = lambda q, k, v: jnp.sum(
        graph_attention(g, q, k, v, score="dot", method="reference") * t)
    f_dist = lambda q, k, v: jnp.sum(
        dist_graph_attention(pg, mesh8, q, k, v, score="dot") * t)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(f_dist, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_shared_segments_dropout_parity(rng, mesh8):
    """The dropout mask over shared segments + balance permutation is
    bitwise the single-chip bucketed mask (global ORIGINAL (dst, src)
    hash: row via drop_rows, lanes via the id_perm inverse)."""
    g = _power_law_graph(rng, n=1024, e_bg=4096, supers=((3, 700),))
    n = g.n_nodes
    q, k, v = (jnp.asarray(rng.standard_normal((n, 1, 16)).astype(np.float32))
               for _ in range(3))
    pg = partition_graph(g, 8, split_width=256)
    assert pg.shared_segments is not None and pg.node_perm is not None
    bg = formats.preprocess("bucketed", g, split_width=256)
    key = jax.random.key(3)
    want = bucket_graph_attention(bg, q, k, v, dropout_rate=0.3,
                                  dropout_rng=key)
    got = dist_graph_attention(pg, mesh8, q, k, v, dropout_rate=0.3,
                               dropout_rng=key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
