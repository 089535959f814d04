"""Fused attention-aggregate over the degree-bucketed padded-CSR format.

Full-graph strategy covering the roles of the reference's ``csr``,
``softmax``, ``csr_gm``/``softmax_gm`` and ``tiling`` CUDA strategies
(``DFGNN/src/fused_gtconv/fused_gtconv_csr.cu``, ``_softmax.cu``,
``_tiling.cu``): every row's SDDMM + softmax + aggregation happens in one
fused computation, with static shapes per degree bucket instead of dynamic
shared memory.

Memory discipline: gathered ``[rows, width, h, f]`` neighbor tensors are the
big temporaries, so rows are processed in chunks (``lax.map``), and buckets
wider than ``tile_width`` stream neighbor tiles with flash-attention-style
online softmax rescaling — the same algebra as the reference's tiling kernel
(``fused_gtconv_tiling.cu:72-86``) — so super-node rows (reddit) never
materialise their full neighborhood.

Everything is XLA (jnp + scan/map): autodiff works end-to-end, and XLA fuses
the mask/exp chains into the batched contractions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dfgnn_tpu.formats import Bucket, BucketedGraph

_NEG_BIG = -1e30


def _chunk_scores(q_c, k_n, e_row_c, e_col_n, emask, val, score, negative_slope):
    """Scores for one gathered chunk.

    q_c: [C, h, f] (dot) / e_row_c: [C, h] (add); k_n/e_col_n gathered over
    neighbors: [C, W, h, f] / [C, W, h].  Returns masked scores [C, h, W].
    """
    if score == "dot":
        s = jnp.einsum("chf,cwhf->chw", q_c, k_n)
    else:
        s = e_row_c[:, :, None] + e_col_n.transpose(0, 2, 1)
        s = jax.nn.leaky_relu(s, negative_slope=negative_slope)
    if val is not None:
        s = s * val[:, None, :]
    return jnp.where(emask[:, None, :], s, _NEG_BIG)


def _direct_chunk(args, q, k, v, e_row, e_col, score, negative_slope):
    """One row-chunk, neighborhood fully materialised (width <= tile)."""
    row_ids, nbr, emask, val = args
    flat = nbr.reshape(-1)
    k_n = None if k is None else jnp.take(k, flat, axis=0, mode="clip").reshape(*nbr.shape, *k.shape[1:])
    v_n = jnp.take(v, flat, axis=0, mode="clip").reshape(*nbr.shape, *v.shape[1:])
    q_c = None if q is None else jnp.take(q, row_ids, axis=0, mode="clip")
    er_c = None if e_row is None else jnp.take(e_row, row_ids, axis=0, mode="clip")
    ec_n = None if e_col is None else jnp.take(e_col, flat, axis=0, mode="clip").reshape(*nbr.shape, e_col.shape[1])
    s = _chunk_scores(q_c, k_n, er_c, ec_n, emask, val, score, negative_slope)
    m = jnp.max(s, axis=-1, keepdims=True)
    ex = jnp.where(emask[:, None, :], jnp.exp(s - jnp.maximum(m, _NEG_BIG)), 0.0)
    den = jnp.sum(ex, axis=-1, keepdims=True)
    w = jnp.where(den > 0, ex / jnp.where(den > 0, den, 1.0), 0.0)
    return jnp.einsum("chw,cwhf->chf", w, v_n)


def _tiled_chunk(args, q, k, v, e_row, e_col, score, negative_slope, tile_width):
    """One row-chunk of a super-wide bucket: stream neighbor tiles with
    online-softmax rescaling (reference tiling algebra,
    ``fused_gtconv_tiling.cu:72-86``)."""
    row_ids, nbr, emask, val = args
    C, W = nbr.shape
    h = v.shape[1]
    f = v.shape[2]
    n_tiles = W // tile_width
    q_c = None if q is None else jnp.take(q, row_ids, axis=0, mode="clip")
    er_c = None if e_row is None else jnp.take(e_row, row_ids, axis=0, mode="clip")

    def body(carry, t):
        m, l, acc = carry
        sl = jax.lax.dynamic_slice_in_dim(nbr, t * tile_width, tile_width, axis=1)
        msl = jax.lax.dynamic_slice_in_dim(emask, t * tile_width, tile_width, axis=1)
        vsl = None if val is None else jax.lax.dynamic_slice_in_dim(val, t * tile_width, tile_width, axis=1)
        flat = sl.reshape(-1)
        k_n = None if k is None else jnp.take(k, flat, axis=0, mode="clip").reshape(C, tile_width, h, f)
        v_n = jnp.take(v, flat, axis=0, mode="clip").reshape(C, tile_width, h, f)
        ec_n = None if e_col is None else jnp.take(e_col, flat, axis=0, mode="clip").reshape(C, tile_width, h)
        s = _chunk_scores(q_c, k_n, er_c, ec_n, msl, vsl, score, negative_slope)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        scale = jnp.exp(m - m_new)
        ex = jnp.where(msl[:, None, :], jnp.exp(s - m_new), 0.0)
        l_new = l * scale + jnp.sum(ex, axis=-1, keepdims=True)
        acc_new = acc * scale + jnp.einsum("chw,cwhf->chf", ex, v_n)
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((C, h, 1), _NEG_BIG, dtype=v.dtype),
        jnp.zeros((C, h, 1), dtype=v.dtype),
        jnp.zeros((C, h, f), dtype=v.dtype),
    )
    (m, l, acc), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    return jnp.where(l > 0, acc / jnp.where(l > 0, l, 1.0), 0.0)


def bucket_graph_attention(
    bg: BucketedGraph,
    q: Optional[jax.Array],
    k: Optional[jax.Array],
    v: jax.Array,
    *,
    score: str = "dot",
    e_row: Optional[jax.Array] = None,
    e_col: Optional[jax.Array] = None,
    negative_slope: float = 0.2,
    tile_width: int = 2048,
) -> jax.Array:
    """Fused SDDMM -> edge-softmax -> SpMM over all degree buckets.

    ``q,k,v``: ``[n_nodes, h, f]`` (dot) or ``e_row,e_col``: ``[n_nodes, h]``
    (add).  Returns ``[n_nodes, h, f]``; rows with no edges produce zeros.
    """
    h, f = v.shape[1], v.shape[2]
    out = jnp.zeros((bg.n_nodes + 1, h, f), dtype=v.dtype)
    for b in bg.buckets:
        r_pad, W = b.nbr.shape
        chunk = b.row_chunk
        if chunk <= 0 or chunk > r_pad or r_pad % chunk:
            chunk = r_pad
        n_chunks = r_pad // chunk
        chunked = (
            b.row_ids.reshape(n_chunks, chunk),
            b.nbr.reshape(n_chunks, chunk, W),
            b.emask.reshape(n_chunks, chunk, W),
            None if b.val is None else b.val.reshape(n_chunks, chunk, W),
        )
        if W <= tile_width:
            fn = lambda a: _direct_chunk(a, q, k, v, e_row, e_col, score, negative_slope)
        else:
            assert W % tile_width == 0
            fn = lambda a: _tiled_chunk(a, q, k, v, e_row, e_col, score, negative_slope, tile_width)
        if n_chunks == 1:
            out_b = fn(tuple(None if x is None else x[0] for x in chunked))
            out_b = out_b[None]
        else:
            out_b = jax.lax.map(fn, chunked)
        out = out.at[b.row_ids].set(out_b.reshape(r_pad, h, f), mode="drop", unique_indices=False)
    return out[: bg.n_nodes]
