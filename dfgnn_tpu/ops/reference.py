"""Unfused XLA oracle ops: SDDMM, edge-softmax, SpMM via segment reductions.

This is the framework's correctness oracle — the role the DGL-sparse path
plays in the reference (``DFGNN/layers/GT/gtconv_layer.py:30-33``:
``bsddmm(A, q, k^T) -> softmax -> bspmm``).  It is pure ``jnp`` + segment
ops, runs on CPU or TPU, and differentiates through standard autodiff.

Conventions (see :mod:`dfgnn_tpu.graph`): scores/softmax/aggregation are per
**row**; ``q`` lives on rows, ``k``/``v`` on cols.  Feature layout is
``[n_nodes, heads, head_dim]``; edge scores are ``[e_pad, heads]``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dfgnn_tpu.graph import Graph

_NEG_BIG = -1e30


def _gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather tolerating the sentinel pad index (clipped; padded lanes
    are masked out downstream)."""
    return jnp.take(x, idx, axis=0, mode="clip")


def sddmm_dot(g: Graph, q: jax.Array, k: jax.Array) -> jax.Array:
    """Per-edge scaled-dot scores: ``score_e = <q[rows_e], k[cols_e]>``.

    Oracle for the reference's edge-parallel COO SDDMM
    (``DFGNN/src/sddmm/sddmm.cuh:35-71``).  Multiplies by ``g.val`` when
    present (the reference kernels scale scores by ``A.val``).
    Returns ``[e_pad, heads]``.
    """
    qs = _gather(q, g.rows)          # [e, h, f]
    ks = _gather(k, g.cols)
    scores = jnp.einsum("ehf,ehf->eh", qs, ks)
    if g.val is not None:
        scores = scores * g.val[:, None]
    return scores


def sddmm_add(
    g: Graph,
    e_row: jax.Array,
    e_col: jax.Array,
    negative_slope: float = 0.2,
) -> jax.Array:
    """GAT additive scores: ``leaky_relu(e_row[rows_e] + e_col[cols_e])``.

    Oracle for the reference GAT scoring
    (``DFGNN/layers/GAT/gatconv_layer.py:30-38``:
    ``e = e_l[A.row] + e_r[A.col]; a = LeakyReLU(e)``).
    ``e_row``/``e_col`` are per-node per-head scalars ``[n, h]``.
    """
    s = _gather(e_row, g.rows) + _gather(e_col, g.cols)
    return jax.nn.leaky_relu(s, negative_slope=negative_slope)


def edge_softmax(g: Graph, scores: jax.Array) -> jax.Array:
    """Numerically-stable softmax over each row's edges.

    Matches the reference's two-pass max/sum-exp softmax with the
    zero-degree guard ``expAll = expAll != 0 ? 1/expAll : 0``
    (``DFGNN/src/fused_gtconv/fused_gtconv_hyper.cu:243-273``).
    """
    n_seg = g.n_nodes + 1  # one extra segment collects padded edges
    mask = g.edge_mask[:, None]
    s = jnp.where(mask, scores, _NEG_BIG)
    row_max = jax.ops.segment_max(
        s, g.rows, num_segments=n_seg, indices_are_sorted=True
    )
    row_max = jnp.maximum(row_max, _NEG_BIG)  # avoid -inf for empty segments
    ex = jnp.where(mask, jnp.exp(s - _gather(row_max, g.rows)), 0.0)
    den = jax.ops.segment_sum(
        ex, g.rows, num_segments=n_seg, indices_are_sorted=True
    )
    den_e = _gather(den, g.rows)
    return jnp.where(den_e > 0, ex / jnp.where(den_e > 0, den_e, 1.0), 0.0)


def spmm(g: Graph, weights: jax.Array, v: jax.Array) -> jax.Array:
    """Weighted neighbor aggregation: ``out[r] = sum_e w_e * v[cols_e]``.

    Oracle for the reference's node-parallel SpMM phase
    (``DFGNN/src/spmm/spmm.cuh:8-83``).  Returns ``[n_nodes, h, f]``.
    """
    vs = _gather(v, g.cols)                     # [e, h, f]
    contrib = weights[:, :, None] * vs
    out = jax.ops.segment_sum(
        contrib, g.rows, num_segments=g.n_nodes + 1, indices_are_sorted=True
    )
    return out[: g.n_nodes]


def attn_dropout(w: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    """Dropout on normalised attention weights with 1/(1-p) rescaling —
    the reference's fused-GAT edge dropout semantics
    (``fused_gatconv_kernel.cu:101-110``: curand mask > p, scaled)."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, w.shape)
    return jnp.where(keep, w / (1.0 - rate), 0.0)


def graph_attention_reference(
    g: Graph,
    q: Optional[jax.Array],
    k: Optional[jax.Array],
    v: jax.Array,
    *,
    score: str = "dot",
    e_row: Optional[jax.Array] = None,
    e_col: Optional[jax.Array] = None,
    negative_slope: float = 0.2,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    return_weights: bool = False,
):
    """Full unfused SDDMM -> edge-softmax -> SpMM attention convolution.

    ``score='dot'``: GT/AGNN/DotGAT scoring from ``q``/``k``.
    ``score='add'``: GAT scoring from per-node scalars ``e_row``/``e_col``.
    """
    if score == "dot":
        scores = sddmm_dot(g, q, k)
    elif score == "add":
        scores = sddmm_add(g, e_row, e_col, negative_slope)
        if g.val is not None:
            scores = scores * g.val[:, None]
    else:
        raise ValueError(f"unknown score mode {score!r}")
    w = edge_softmax(g, scores)
    if dropout_rate > 0.0:
        w = attn_dropout(w, dropout_rate, dropout_rng)
    out = spmm(g, w, v)
    if return_weights:
        return out, w
    return out
