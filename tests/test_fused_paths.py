"""Fused paths (bucketed full-graph, dense batched) vs the unfused oracle.

This is the framework's analog of the reference's fused-vs-DGL-sparse
cross-check (``DFGNN/utils/util.py:211-236``, rtol=1e-3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dfgnn_tpu.graph import DenseBatch, Graph
from dfgnn_tpu.formats import build_buckets
from dfgnn_tpu.ops import graph_attention, graph_attention_reference
from helpers import make_graph, random_graph_coo


def _qkv(rng, n, h, f):
    return tuple(
        jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32)) for _ in range(3)
    )


@pytest.mark.parametrize("score", ["dot", "add"])
def test_bucket_matches_oracle(rng, score):
    n, h, f = 200, 2, 16
    g = make_graph(rng, n, 10, with_val=(score == "dot"))
    bg = build_buckets(g)
    q, k, v = _qkv(rng, n, h, f)
    e_row = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    e_col = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    kw = dict(score=score, e_row=e_row, e_col=e_col)
    want = graph_attention_reference(g, q, k, v, **kw)
    got = graph_attention(bg, q, k, v, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5)


def test_bucket_super_node_tiling(rng):
    """Super-node row wider than tile_width exercises the online-softmax
    streaming path (reference tiling strategy analog, ``split_width=None``
    layout)."""
    n, h, f = 600, 1, 8
    g = make_graph(rng, n, 3, super_node_deg=500)
    bg = build_buckets(g, split_width=None)
    assert bg.segments is None
    assert max(b.width for b in bg.buckets) >= 512
    q, k, v = _qkv(rng, n, h, f)
    want = graph_attention_reference(g, q, k, v)
    from dfgnn_tpu.ops.bucket import bucket_graph_attention

    got = bucket_graph_attention(bg, q, k, v, tile_width=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("score", ["dot", "add"])
def test_bucket_segment_split(rng, score):
    """Default layout splits super-wide rows into fixed-width segments
    merged by the associative online-softmax combine; must match the oracle
    exactly (and autodiff through the merge)."""
    import jax

    n, h, f = 600, 2, 8
    g = make_graph(rng, n, 3, super_node_deg=500, with_val=(score == "dot"))
    bg = build_buckets(g, split_width=64)
    assert bg.segments is not None and bg.segments.n_segments >= 8
    q, k, v = _qkv(rng, n, h, f)
    e_row = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    e_col = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    kw = dict(score=score, e_row=e_row, e_col=e_col)
    want = graph_attention_reference(g, q, k, v, **kw)
    got = graph_attention(bg, q, k, v, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5)

    if score == "dot":
        t = jnp.asarray(rng.standard_normal(want.shape).astype(np.float32))
        g_ref = jax.grad(lambda v: jnp.sum(graph_attention_reference(g, q, k, v) * t))(v)
        g_seg = jax.grad(lambda v: jnp.sum(graph_attention(bg, q, k, v) * t))(v)
        np.testing.assert_allclose(np.asarray(g_seg), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("score", ["dot", "add"])
def test_dense_batch_matches_oracle(rng, score):
    """DenseBatch path vs the same graphs flattened into block-diagonal
    edge format and run through the oracle."""
    B, P_real, h, f = 4, 50, 2, 8
    graphs = []
    for _ in range(B):
        nb = int(rng.integers(20, P_real))
        rows, cols, _ = random_graph_coo(rng, nb, 6, zero_deg_frac=0.2)
        graphs.append((rows, cols, nb))
    batch = DenseBatch.from_graph_list(graphs, np_pad=64)
    g = batch.to_graph()
    N = g.n_nodes
    rng2 = np.random.default_rng(7)
    q = rng2.standard_normal((N, h, f)).astype(np.float32)
    k = rng2.standard_normal((N, h, f)).astype(np.float32)
    v = rng2.standard_normal((N, h, f)).astype(np.float32)
    e_row = rng2.standard_normal((N, h)).astype(np.float32)
    e_col = rng2.standard_normal((N, h)).astype(np.float32)
    kw = dict(score=score)
    want = graph_attention_reference(
        g, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        e_row=jnp.asarray(e_row), e_col=jnp.asarray(e_col), **kw,
    )
    P = batch.np_pad
    got = graph_attention(
        batch,
        jnp.asarray(q.reshape(B, P, h, f)),
        jnp.asarray(k.reshape(B, P, h, f)),
        jnp.asarray(v.reshape(B, P, h, f)),
        e_row=jnp.asarray(e_row.reshape(B, P, h)),
        e_col=jnp.asarray(e_col.reshape(B, P, h)),
        **kw,
    )
    np.testing.assert_allclose(
        np.asarray(got).reshape(N, h, f), np.asarray(want), rtol=1e-3, atol=1e-5
    )


@pytest.mark.parametrize("score", ["dot", "add"])
@pytest.mark.parametrize("with_val", [False, True])
def test_bucket_custom_vjp_matches_oracle_grads(rng, score, with_val):
    """Fused custom backward (transpose layout: CSR-direction dQ +
    CSC-direction dK/dV, reference fused_gtconv_backward.cu design) vs
    oracle grads, both score modes, with/without edge values."""
    import jax

    n, h, f = 300, 2, 8
    g = make_graph(rng, n, 8, super_node_deg=200, with_val=with_val)
    bg = build_buckets(g, split_width=32, with_transpose=True)
    assert bg.transpose is not None
    q, k, v = _qkv(rng, n, h, f)
    er, ec = (jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
              for _ in range(2))
    t = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
    kw = dict(score=score, e_row=er, e_col=ec)

    np.testing.assert_allclose(
        np.asarray(graph_attention(bg, q, k, v, **kw)),
        np.asarray(graph_attention_reference(g, q, k, v, **kw)),
        rtol=1e-3, atol=1e-5,
    )
    if score == "dot":
        args, argnums = (q, k, v), (0, 1, 2)
        f_ref = lambda q, k, v: jnp.sum(graph_attention_reference(g, q, k, v) * t)
        f_buk = lambda q, k, v: jnp.sum(graph_attention(bg, q, k, v) * t)
    else:
        args, argnums = (er, ec, v), (0, 1, 2)
        f_ref = lambda er, ec, v: jnp.sum(graph_attention_reference(
            g, None, None, v, score="add", e_row=er, e_col=ec) * t)
        f_buk = lambda er, ec, v: jnp.sum(graph_attention(
            bg, None, None, v, score="add", e_row=er, e_col=ec) * t)
    for a, b in zip(jax.grad(f_buk, argnums)(*args), jax.grad(f_ref, argnums)(*args)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("score", ["dot", "add"])
def test_blocked_layout_matches_oracle(rng, score):
    """Source-blocked layout (fast-gather sub-tables + exact cross-block
    logsumexp merge) vs oracle, forward and custom-backward grads."""
    import jax
    from dfgnn_tpu.formats import BlockedBucketedGraph

    n, h, f = 500, 2, 8
    g = make_graph(rng, n, 8, super_node_deg=200)
    bbg = build_buckets(g, split_width=64, src_block_rows=150,
                        with_transpose=True)
    assert isinstance(bbg, BlockedBucketedGraph) and len(bbg.blocks) >= 3
    q, k, v = _qkv(rng, n, h, f)
    er, ec = (jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
              for _ in range(2))
    t = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
    kw = dict(score=score, e_row=er, e_col=ec)
    np.testing.assert_allclose(
        np.asarray(graph_attention(bbg, q, k, v, **kw)),
        np.asarray(graph_attention_reference(g, q, k, v, **kw)),
        rtol=1e-3, atol=1e-5,
    )
    if score == "dot":
        f_ref = lambda q, k, v: jnp.sum(graph_attention_reference(g, q, k, v) * t)
        f_blk = lambda q, k, v: jnp.sum(graph_attention(bbg, q, k, v) * t)
        args = (q, k, v)
    else:
        f_ref = lambda er, ec, v: jnp.sum(graph_attention_reference(
            g, None, None, v, score="add", e_row=er, e_col=ec) * t)
        f_blk = lambda er, ec, v: jnp.sum(graph_attention(
            bbg, None, None, v, score="add", e_row=er, e_col=ec) * t)
        args = (er, ec, v)
    for a, b in zip(jax.grad(f_blk, (0, 1, 2))(*args),
                    jax.grad(f_ref, (0, 1, 2))(*args)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_bucket_autodiff_matches_oracle_grads(rng):
    n, h, f = 80, 1, 8
    g = make_graph(rng, n, 6)
    bg = build_buckets(g)
    q, k, v = _qkv(rng, n, h, f)
    t = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
    import jax

    g_ref = jax.grad(lambda q, k, v: jnp.sum(graph_attention_reference(g, q, k, v) * t), (0, 1, 2))(q, k, v)
    g_buk = jax.grad(lambda q, k, v: jnp.sum(graph_attention(bg, q, k, v) * t), (0, 1, 2))(q, k, v)
    for a, b in zip(g_buk, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
