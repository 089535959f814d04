"""Oracle ops vs plain-numpy ground truth.

Correctness bar mirrors the reference's ``check_correct``
(``DFGNN/utils/util.py:211-236``): allclose rtol=1e-3; we use tighter
tolerances since both sides are fp32 XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfgnn_tpu.graph import Graph
from dfgnn_tpu.ops import graph_attention_reference, edge_softmax, sddmm_dot, spmm
from helpers import make_graph, numpy_attention, random_graph_coo


def _qkv(rng, n, h, f):
    q = rng.standard_normal((n, h, f)).astype(np.float32)
    k = rng.standard_normal((n, h, f)).astype(np.float32)
    v = rng.standard_normal((n, h, f)).astype(np.float32)
    return q, k, v


@pytest.mark.parametrize("h,f", [(1, 16), (4, 8)])
def test_dot_attention_matches_numpy(rng, h, f):
    n = 60
    rows, cols, val = random_graph_coo(rng, n, 5, with_val=False)
    g = Graph.from_coo(rows, cols, n)
    q, k, v = _qkv(rng, n, h, f)
    out = graph_attention_reference(g, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = numpy_attention(rows, cols, n, v, q=q, k=k, score="dot")
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_dot_attention_with_edge_values(rng):
    n, h, f = 40, 2, 8
    rows, cols, val = random_graph_coo(rng, n, 4, with_val=True)
    g = Graph.from_coo(rows, cols, n, val=val)
    # from_coo sorts edges; recover sorted val order for the numpy check
    order = np.argsort(rows, kind="stable")
    q, k, v = _qkv(rng, n, h, f)
    out = graph_attention_reference(g, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = numpy_attention(rows[order], cols[order], n, v, q=q, k=k, val=val[order], score="dot")
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_add_attention_matches_numpy(rng):
    n, h = 50, 3
    f = 8
    rows, cols, _ = random_graph_coo(rng, n, 6)
    g = Graph.from_coo(rows, cols, n)
    e_row = rng.standard_normal((n, h)).astype(np.float32)
    e_col = rng.standard_normal((n, h)).astype(np.float32)
    v = rng.standard_normal((n, h, f)).astype(np.float32)
    out = graph_attention_reference(
        g, None, None, jnp.asarray(v), score="add",
        e_row=jnp.asarray(e_row), e_col=jnp.asarray(e_col),
    )
    want = numpy_attention(rows, cols, n, v, e_row=e_row, e_col=e_col, score="add")
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_zero_degree_rows_produce_zeros(rng):
    n, h, f = 30, 2, 4
    g = make_graph(rng, n, 4, zero_deg_frac=0.3)
    q, k, v = _qkv(rng, n, h, f)
    out = np.asarray(graph_attention_reference(g, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    deg = np.asarray(g.degrees)
    assert (out[deg == 0] == 0).all()
    assert np.abs(out[deg > 0]).sum() > 0


def test_edge_softmax_rows_sum_to_one(rng):
    n = 40
    g = make_graph(rng, n, 5)
    scores = jnp.asarray(np.random.default_rng(1).standard_normal((g.e_pad, 2)).astype(np.float32))
    w = edge_softmax(g, scores)
    sums = jax.ops.segment_sum(w, g.rows, num_segments=n + 1)[:n]
    deg = np.asarray(g.degrees)
    np.testing.assert_allclose(np.asarray(sums)[deg > 0], 1.0, rtol=1e-5)
    assert (np.asarray(w)[np.asarray(g.edge_mask) == 0] == 0).all()


def test_autodiff_through_oracle(rng):
    """Autodiff parity: segment-op oracle grads == dense-formulation grads."""
    n, h, f = 25, 2, 4
    rows, cols, _ = random_graph_coo(rng, n, 4, zero_deg_frac=0.0)
    g = Graph.from_coo(rows, cols, n)
    q, k, v = _qkv(rng, n, h, f)
    tangent = rng.standard_normal((n, h, f)).astype(np.float32)

    def loss_sparse(q, k, v):
        out = graph_attention_reference(g, q, k, v)
        return jnp.sum(out * tangent)

    def loss_dense(q, k, v):
        A = jnp.full((n, n), -1e30)
        A = A.at[g.rows[: g.n_edges], g.cols[: g.n_edges]].set(0.0)
        s = jnp.einsum("rhf,chf->hrc", q, k) + A[None]
        w = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("hrc,chf->rhf", w, v)
        return jnp.sum(out * tangent)

    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gs = jax.grad(loss_sparse, argnums=(0, 1, 2))(*args)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(*args)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_sddmm_spmm_standalone(rng):
    n, h, f = 20, 1, 4
    g = make_graph(rng, n, 3, zero_deg_frac=0.0)
    q, k, v = _qkv(rng, n, h, f)
    s = sddmm_dot(g, jnp.asarray(q), jnp.asarray(k))
    rows = np.asarray(g.rows)[: g.n_edges]
    cols = np.asarray(g.cols)[: g.n_edges]
    want = np.einsum("ehf,ehf->eh", q[rows], k[cols])
    np.testing.assert_allclose(np.asarray(s)[: g.n_edges], want, rtol=1e-5, atol=1e-6)
    w = jnp.ones((g.e_pad, h)) * jnp.asarray(g.edge_mask[:, None], jnp.float32)
    agg = spmm(g, w, jnp.asarray(v))
    want_agg = np.zeros((n, h, f), np.float32)
    np.add.at(want_agg, rows, v[cols])
    np.testing.assert_allclose(np.asarray(agg), want_agg, rtol=1e-5, atol=1e-5)
