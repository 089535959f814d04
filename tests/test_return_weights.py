"""Materialized-score mode (``return_weights``/``two_phase``) and
``gather_dtype=bfloat16`` coverage on the bucket path.

The reference's ``softmax`` strategy materializes normalized attention
weights per edge (``attn_edge``, ``fused_gtconv_softmax.cu:10-54``); here
``bucket_graph_attention(return_weights=True)`` must reproduce the oracle's
``edge_softmax`` weights in the Graph's CSR edge order across every layout
(plain buckets, segment-split super rows, source-blocked).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dfgnn_tpu import formats
from dfgnn_tpu.graph import Graph
from dfgnn_tpu.ops.bucket import bucket_graph_attention
from dfgnn_tpu.ops.reference import graph_attention_reference

from helpers import make_graph


def _qkv(rng, n, h=2, f=16):
    return tuple(
        jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
        for _ in range(3)
    )


def _check_weights(g, bg, rng, *, score="dot", rtol=2e-3, atol=1e-5):
    n, h, f = g.n_nodes, 2, 16
    q, k, v = _qkv(rng, n, h, f)
    if score == "dot":
        out, w = bucket_graph_attention(bg, q, k, v, return_weights=True)
        out_ref, w_ref = graph_attention_reference(
            g, q, k, v, return_weights=True)
    else:
        e_row = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
        e_col = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
        out, w = bucket_graph_attention(
            bg, None, None, v, score="add", e_row=e_row, e_col=e_col,
            return_weights=True)
        out_ref, w_ref = graph_attention_reference(
            g, None, None, v, score="add", e_row=e_row, e_col=e_col,
            return_weights=True)
    mask = np.asarray(g.edge_mask)
    w = np.asarray(w)
    w_ref = np.asarray(w_ref)
    assert w.shape == w_ref.shape == (g.e_pad, h)
    # real edges: exact CSR-edge-order parity with the oracle softmax
    np.testing.assert_allclose(w[mask], w_ref[mask], rtol=rtol, atol=atol)
    # padded edge slots carry zero weight
    np.testing.assert_array_equal(w[~mask], 0.0)
    # weights sum to 1 over each live row
    sums = np.zeros((n + 1, h))
    np.add.at(sums, np.asarray(g.rows)[mask], w[mask])
    live = sums[:n].sum(axis=1) > 0
    np.testing.assert_allclose(sums[:n][live], 1.0, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), rtol=rtol, atol=1e-4)


def test_return_weights_plain(rng):
    g = make_graph(rng, 150, 6)
    bg = formats.preprocess("two_phase", g)
    _check_weights(g, bg, rng)


def test_return_weights_segments(rng):
    # super-node row forces the fixed-width segment layout (split rows)
    g = make_graph(rng, 200, 5, super_node_deg=150)
    bg = formats.preprocess("two_phase", g)
    assert bg.segments is not None, "layout should carry segment-split rows"
    _check_weights(g, bg, rng)


def test_return_weights_blocked(rng):
    # source-blocked layout: weights accumulate across block-local walks
    g = make_graph(rng, 256, 6, super_node_deg=120)
    bg = formats.preprocess("two_phase", g, src_block_rows=64)
    assert isinstance(bg, formats.BlockedBucketedGraph)
    _check_weights(g, bg, rng)


def test_return_weights_add_score(rng):
    g = make_graph(rng, 150, 6, super_node_deg=100)
    bg = formats.preprocess("two_phase", g)
    _check_weights(g, bg, rng, score="add")


def test_return_weights_with_val(rng):
    g = make_graph(rng, 120, 5, with_val=True)
    bg = formats.preprocess("two_phase", g)
    _check_weights(g, bg, rng)


def test_return_weights_requires_edge_ids(rng):
    g = make_graph(rng, 64, 4)
    bg = formats.preprocess("bucketed", g)  # no edge-id layout
    q, k, v = _qkv(rng, g.n_nodes)
    with pytest.raises(ValueError, match="edge-id layout"):
        bucket_graph_attention(bg, q, k, v, return_weights=True)


def _row_rel_err(a, b):
    """Per-row relative L2 error ||a-b|| / max(||b||, eps) over (h, f).

    Elementwise relative error is meaningless near an output's
    zero-crossings (a ~1e-3 element with bf16-score-shifted weights reads
    as O(1) relative error); the documented ~1e-2 band for
    ``gather_dtype=bfloat16`` is a row-norm statement."""
    d = np.linalg.norm((a - b).reshape(a.shape[0], -1), axis=1)
    n = np.linalg.norm(b.reshape(b.shape[0], -1), axis=1)
    return d / np.maximum(n, 1e-6)


def test_gather_dtype_bf16_rel_err(rng):
    """bf16 gather tables: scores/accumulation stay fp32; the result must
    stay within the documented ~1e-2 relative band of the fp32 path (and
    actually differ from it, proving the cast path ran)."""
    g = make_graph(rng, 300, 8, super_node_deg=120)
    bg = formats.preprocess("bucketed", g)
    q, k, v = _qkv(rng, g.n_nodes, h=1, f=32)
    out32 = np.asarray(bucket_graph_attention(bg, q, k, v))
    out16 = np.asarray(
        bucket_graph_attention(bg, q, k, v, gather_dtype=jnp.bfloat16))
    assert out16.dtype == np.float32
    rel = _row_rel_err(out16, out32)
    assert rel.max() < 0.05, f"bf16 gather rowwise rel err {rel.max():.3f}"
    assert rel.max() > 0.0, "bf16 path produced bitwise-identical output"


def test_gather_dtype_bf16_blocked(rng):
    g = make_graph(rng, 256, 6)
    bg = formats.preprocess("bucketed", g, src_block_rows=64)
    assert isinstance(bg, formats.BlockedBucketedGraph)
    q, k, v = _qkv(rng, g.n_nodes, h=1, f=32)
    out32 = np.asarray(bucket_graph_attention(bg, q, k, v))
    out16 = np.asarray(
        bucket_graph_attention(bg, q, k, v, gather_dtype=jnp.bfloat16))
    assert _row_rel_err(out16, out32).max() < 0.05
