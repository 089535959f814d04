"""Fused attention-aggregate over the degree-bucketed padded-CSR format.

Full-graph strategy covering the roles of the reference's ``csr``,
``softmax``, ``csr_gm``/``softmax_gm`` and ``tiling`` CUDA strategies
(``DFGNN/src/fused_gtconv/fused_gtconv_csr.cu``, ``_softmax.cu``,
``_tiling.cu``): every row's SDDMM + softmax + aggregation happens in one
fused computation, with static shapes per degree bucket instead of dynamic
shared memory.

TPU cost model (measured on v5e): XLA row-gathers are per-ROW-overhead
bound (~4ns/row for 256B-1KB rows, independent of sortedness or dtype), so
padded-edge COUNT is the cost of this path.  Therefore (a) all source-side
operands are packed into ONE gather table per call (k||v for dot scores,
v||e_col for additive scores) so each edge is gathered exactly once, (b)
the layout minimises padded edges (x1.5 width ladder + fixed-width segments
for super-wide rows, see ``formats.build_buckets``), and (c) row chunks are
kept at VMEM scale (``_GATHER_BUDGET_BYTES``) so XLA fuses the gather into
its consumers instead of round-tripping the gathered buffer through HBM.
Super-wide rows are handled by the segment layout's per-segment partial
(m, l, acc) states merged with the online-softmax combine — the same
algebra as the reference's tiling kernel (``fused_gtconv_tiling.cu:72-86``);
the in-chunk ``_tiled_chunk`` scan remains for ``split_width=None``
layouts.

Training backward: when the layout carries a transpose
(``build_buckets(with_transpose=True)``), a ``custom_vjp`` mirrors the
reference's fused backward (``fused_gtconv_backward.cu:231-265``): the
CSR-direction pass recomputes scores from the saved per-row logsumexp and
produces dQ (``fused_backward_kernel`` :74-191), and a CSC-direction pass
over the transposed layout produces dK/dV (``spmm_backward_kernel``
:41-70) — both are gather-based row reductions, never scatter-adds.  The
O(N·h) lse residual replaces the reference's O(E·h) ``attn_edge`` stash.
Without a transpose, XLA autodiff applies (gather transposes to
scatter-add; ~3x slower at scale).

Everything is XLA (jnp + scan/map): autodiff works end-to-end.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes as jax_dtypes

from dfgnn_tpu.formats import (
    BlockedBucketedGraph, Bucket, BucketedGraph, SegmentBucket,
)

_NEG_BIG = -1e30
_DEAD = 0.5 * _NEG_BIG  # rows with lse below this have no edges

# Target bytes for one chunk's gathered source tensor.  Measured on TPU
# v5e (quarter-reddit, dim 128): VMEM-scale chunks (8-16MB) let XLA fuse
# gather -> score -> softmax -> aggregate without an HBM round trip of the
# gathered buffer (19.5ms vs 27ms at 512MB); the remaining cost is the
# per-row random-gather floor (~4ns/padded edge).
_GATHER_BUDGET_BYTES = 16 * 1024 * 1024


def _scores_from_parts(q_c, k_n, er_c, ec_n, emask, val, score, negative_slope):
    """Masked scores [C, h, W] from per-chunk operands."""
    if score == "dot":
        s = jnp.einsum("chf,cwhf->chw", q_c, k_n)
    else:
        s = er_c[:, :, None] + ec_n.transpose(0, 2, 1)
        s = jax.nn.leaky_relu(s, negative_slope=negative_slope)
    if val is not None:
        s = s * val[:, None, :]
    return jnp.where(emask[:, None, :], s, _NEG_BIG)


def _take_src(src, flat, C, W):
    """One combined gather of all source-side operands for a chunk."""
    fs = src.shape[-1]
    h = src.shape[1]
    out = jnp.take(src, flat, axis=0, mode="clip").reshape(C, W, h, fs)
    return out.astype(jnp.float32)


def _take_rows(x, row_ids):
    return None if x is None else jnp.take(x, row_ids, axis=0, mode="clip")


def _split_src(src_n, score, f):
    if score == "dot":
        return src_n[..., :f], src_n[..., f:], None       # k_n, v_n
    return None, src_n[..., :f], src_n[..., f]            # v_n, ec_n [C,W,h]


def _pick_chunk(r_pad: int, W: int, h: int, fs: int, itemsize: int) -> int:
    """Rows per chunk so one chunk's gathered tensor meets the byte budget
    (VMEM-scale; see module docstring)."""
    desired = max(8, _GATHER_BUDGET_BYTES // max(W * h * fs * itemsize, 1))
    return min(r_pad, desired)


def _chunk_args(arrays, r_pad: int, chunk: int, fills):
    """Pad row-dim arrays to a multiple of ``chunk`` and reshape to
    [n_chunks, chunk, ...].  Returns (chunked_tuple, n_chunks, r_pad2)."""
    n_chunks = -(-r_pad // chunk)
    r_pad2 = n_chunks * chunk
    pad_n = r_pad2 - r_pad

    def pad(x, fill):
        if x is None:
            return None
        if pad_n:
            cfg = [(0, pad_n)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, cfg, constant_values=fill)
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    return tuple(pad(x, f) for x, f in zip(arrays, fills)), n_chunks, r_pad2


def _map_chunks(fn, chunked, n_chunks):
    """lax.map over chunks; single chunk runs unrolled.  ``fn`` returns a
    tuple; result arrays get the leading chunk dims flattened."""
    if n_chunks == 1:
        res = fn(tuple(None if x is None else x[0] for x in chunked))
        res = tuple(r[None] for r in res)
    else:
        res = jax.lax.map(fn, chunked)
    return tuple(r.reshape((-1,) + r.shape[2:]) for r in res)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _direct_chunk(args, q, e_row, src, f, score, negative_slope):
    """One row-chunk, neighborhood fully materialised (width <= tile).
    Returns (out [C,h,f], lse [C,h])."""
    row_ids, nbr, emask, val = args
    C, W = nbr.shape
    src_n = _take_src(src, nbr.reshape(-1), C, W)
    k_n, v_n, ec_n = _split_src(src_n, score, f)
    q_c = _take_rows(q, row_ids)
    er_c = _take_rows(e_row, row_ids)
    s = _scores_from_parts(q_c, k_n, er_c, ec_n, emask, val, score, negative_slope)
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), _NEG_BIG)
    ex = jnp.where(emask[:, None, :], jnp.exp(s - m), 0.0)
    den = jnp.sum(ex, axis=-1, keepdims=True)
    w = jnp.where(den > 0, ex / jnp.where(den > 0, den, 1.0), 0.0)
    out = jnp.einsum("chw,cwhf->chf", w, v_n)
    lse = jnp.where(den > 0, m + jnp.log(jnp.where(den > 0, den, 1.0)), _NEG_BIG)
    return out, lse[..., 0]


def _tiled_chunk(args, q, e_row, src, f, score, negative_slope, tile_width):
    """One row-chunk of a super-wide bucket: stream neighbor tiles with
    online-softmax rescaling (reference tiling algebra,
    ``fused_gtconv_tiling.cu:72-86``)."""
    row_ids, nbr, emask, val = args
    C, W = nbr.shape
    h = src.shape[1]
    n_tiles = W // tile_width
    q_c = _take_rows(q, row_ids)
    er_c = _take_rows(e_row, row_ids)

    def body(carry, t):
        m, l, acc = carry
        sl = jax.lax.dynamic_slice_in_dim(nbr, t * tile_width, tile_width, axis=1)
        msl = jax.lax.dynamic_slice_in_dim(emask, t * tile_width, tile_width, axis=1)
        vsl = None if val is None else jax.lax.dynamic_slice_in_dim(val, t * tile_width, tile_width, axis=1)
        src_n = _take_src(src, sl.reshape(-1), C, tile_width)
        k_n, v_n, ec_n = _split_src(src_n, score, f)
        s = _scores_from_parts(q_c, k_n, er_c, ec_n, msl, vsl, score, negative_slope)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        scale = jnp.exp(m - m_new)
        ex = jnp.where(msl[:, None, :], jnp.exp(s - m_new), 0.0)
        l_new = l * scale + jnp.sum(ex, axis=-1, keepdims=True)
        acc_new = acc * scale + jnp.einsum("chw,cwhf->chf", ex, v_n)
        return (m_new, l_new, acc_new), None

    # carries are fp32 regardless of gather_dtype (accumulation stays fp32)
    init = (
        jnp.full((C, h, 1), _NEG_BIG, dtype=jnp.float32),
        jnp.zeros((C, h, 1), dtype=jnp.float32),
        jnp.zeros((C, h, f), dtype=jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    out = jnp.where(l > 0, acc / jnp.where(l > 0, l, 1.0), 0.0)
    lse = jnp.where(l > 0, m + jnp.log(jnp.where(l > 0, l, 1.0)), _NEG_BIG)
    return out, lse[..., 0]


def _segment_partials(args, q, e_row, src, f, score, negative_slope):
    """Per-segment partial softmax state (m, l, acc) for one chunk of
    fixed-width segments (the online-softmax block state of the reference's
    tiling kernel, ``fused_gtconv_tiling.cu:72-86``, one tile per segment)."""
    seg_dst, nbr, emask, val = args
    C, W = nbr.shape
    src_n = _take_src(src, nbr.reshape(-1), C, W)
    k_n, v_n, ec_n = _split_src(src_n, score, f)
    q_c = _take_rows(q, seg_dst)
    er_c = _take_rows(e_row, seg_dst)
    s = _scores_from_parts(q_c, k_n, er_c, ec_n, emask, val, score, negative_slope)
    m = jnp.max(s, axis=-1)                                   # [C, h]
    ex = jnp.where(emask[:, None, :], jnp.exp(s - m[..., None]), 0.0)
    l = jnp.sum(ex, axis=-1)                                  # [C, h]
    acc = jnp.einsum("chw,cwhf->chf", ex, v_n)                # [C, h, f]
    return m, l, acc


def _run_bucket(b: Bucket, chunk_fn, src_itemsize, h, fs, fills=None):
    """Chunk one bucket's row arrays and map ``chunk_fn`` over them.
    Returns (row_ids_padded, results tuple flattened over rows)."""
    r_pad, W = b.nbr.shape
    chunk = _pick_chunk(r_pad, W, h, fs, src_itemsize)
    arrays = (b.row_ids, b.nbr, b.emask, b.val)
    if fills is None:
        fills = (None, None, False, 0.0)
    chunked, n_chunks, r_pad2 = _chunk_args(arrays, r_pad, chunk, fills)
    res = _map_chunks(chunk_fn, chunked, n_chunks)
    row_ids = chunked[0].reshape(-1)
    return row_ids, res


def _run_segments(sb: SegmentBucket, chunk_fn, src_itemsize, h, fs):
    """Map ``chunk_fn`` over segment chunks; returns per-segment results."""
    s_pad, W = sb.nbr.shape
    chunk = _pick_chunk(s_pad, W, h, fs, src_itemsize)
    chunk = min(chunk, s_pad)
    if s_pad % chunk != 0:
        chunk = sb.row_chunk
    n_chunks = s_pad // chunk
    args = tuple(
        None if x is None else x.reshape((n_chunks, chunk) + x.shape[1:])
        for x in (sb.seg_dst, sb.nbr, sb.emask, sb.val)
    )
    return _map_chunks(chunk_fn, args, n_chunks)


def _segsum(x, seg_id, bins):
    return jax.ops.segment_sum(x, seg_id, num_segments=bins,
                               indices_are_sorted=True)


def _pack_src(k, v, e_col, score, gather_dtype):
    if score == "dot":
        src = jnp.concatenate([k, v], axis=-1)                 # [N, h, 2f]
    elif score == "add":
        src = jnp.concatenate([v, e_col[..., None]], axis=-1)  # [N, h, f+1]
    else:
        raise ValueError(f"unknown score mode {score!r}")
    if gather_dtype is not None:
        src = src.astype(gather_dtype)
    return src


def _forward(bg, q, k, v, score, e_row, e_col, negative_slope, tile_width,
             gather_dtype):
    """Fused forward; returns (out [n,h,f], lse [n,h])."""
    src = _pack_src(k, v, e_col, score, gather_dtype)
    return _forward_src(bg, q, e_row, src, v.dtype, v.shape[2], score,
                        negative_slope, tile_width)


def _forward_src(bg, q, e_row, src, out_dtype, f, score, negative_slope,
                 tile_width):
    """Forward over one (possibly source-block-local) packed src table."""
    h = src.shape[1]
    fs = src.shape[-1]

    out = jnp.zeros((bg.n_nodes + 1, h, f), dtype=out_dtype)
    lse = jnp.full((bg.n_nodes + 1, h), _NEG_BIG, dtype=jnp.float32)
    for b in bg.buckets:
        W = b.nbr.shape[1]
        if W <= tile_width:
            fn = lambda a: _direct_chunk(a, q, e_row, src, f, score, negative_slope)
        else:
            tw = tile_width if W % tile_width == 0 else W
            fn = lambda a: _tiled_chunk(a, q, e_row, src, f, score, negative_slope, tw)
        row_ids, (out_b, lse_b) = _run_bucket(
            b, fn, src.dtype.itemsize, h, fs,
            fills=(bg.n_nodes, bg.n_nodes, False, 0.0),
        )
        out = out.at[row_ids].set(out_b.astype(out.dtype), mode="drop")
        lse = lse.at[row_ids].set(lse_b, mode="drop")

    sb = bg.segments
    if sb is not None:
        fn = lambda a: _segment_partials(a, q, e_row, src, f, score, negative_slope)
        m_s, l_s, acc_s = _run_segments(sb, fn, src.dtype.itemsize, h, fs)
        R = int(sb.wide_rows.shape[0])
        bins = R + 1  # last bin absorbs segment padding
        m_r = jax.ops.segment_max(m_s, sb.seg_id, num_segments=bins,
                                  indices_are_sorted=True)
        m_r = jnp.maximum(m_r, _NEG_BIG)  # empty bins: -inf -> finite
        scale = jnp.exp(m_s - m_r[sb.seg_id])
        l_r = _segsum(l_s * scale, sb.seg_id, bins)
        acc_r = _segsum(acc_s * scale[..., None], sb.seg_id, bins)
        live = l_r[..., None] > 0
        out_r = jnp.where(live, acc_r / jnp.where(live, l_r[..., None], 1.0), 0.0)
        lse_r = jnp.where(l_r > 0, m_r + jnp.log(jnp.where(l_r > 0, l_r, 1.0)),
                          _NEG_BIG)
        out = out.at[sb.wide_rows].set(out_r[:R].astype(out.dtype), mode="drop")
        lse = lse.at[sb.wide_rows].set(lse_r[:R], mode="drop")
    return out[: bg.n_nodes], lse[: bg.n_nodes]


# ---------------------------------------------------------------------------
# Source-blocked layout (BlockedBucketedGraph): per-block forward at the
# fast gather rate + exact cross-block logsumexp merge.
# ---------------------------------------------------------------------------

def _slice_block(src, lo, B):
    """Barriered sub-table slice: materialising it keeps the gather inside
    a small table, which runs ~2x faster than gathering from a >100MB
    buffer (measured; see formats.BlockedBucketedGraph)."""
    sub = jax.lax.dynamic_slice_in_dim(src, lo, B, axis=0)
    return jax.lax.optimization_barrier(sub)


def _pad_rows(x, n_pad):
    if x.shape[0] >= n_pad:
        return x
    cfg = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg)


def _iter_blocks(layout, src):
    """Yield (BucketedGraph, src_table) per source block — or once for a
    flat layout."""
    if isinstance(layout, BlockedBucketedGraph):
        B = layout.block_rows
        src = _pad_rows(src, len(layout.blocks) * B)
        for bi, bg_b in enumerate(layout.blocks):
            yield bg_b, _slice_block(src, bi * B, B)
    else:
        yield layout, src


def _merge_blocks(outs, lses):
    """Exact cross-block softmax combine from per-block (out, lse)."""
    L = jnp.stack(lses)                     # [nb, n, h]
    O = jnp.stack(outs)                     # [nb, n, h, f]
    m = jnp.maximum(jnp.max(L, axis=0), _NEG_BIG)
    w = jnp.where(L > _DEAD, jnp.exp(L - m), 0.0)
    den = jnp.sum(w, axis=0)
    out = jnp.einsum("bnh,bnhf->nhf", w, O)
    live = den[..., None] > 0
    out = jnp.where(live, out / jnp.where(live, den[..., None], 1.0), 0.0)
    lse = jnp.where(den > 0, m + jnp.log(jnp.where(den > 0, den, 1.0)),
                    _NEG_BIG)
    return out, lse


def _blocked_forward(bbg, q, k, v, score, e_row, e_col, negative_slope,
                     tile_width, gather_dtype):
    src = _pack_src(k, v, e_col, score, gather_dtype)
    outs, lses = [], []
    for bg_b, sub in _iter_blocks(bbg, src):
        o, l = _forward_src(bg_b, q, e_row, sub, jnp.float32, v.shape[2],
                            score, negative_slope, tile_width)
        outs.append(o)
        lses.append(l)
    out, lse = _merge_blocks(outs, lses)
    return out.astype(v.dtype), lse


def _any_forward(bg, q, k, v, score, e_row, e_col, negative_slope,
                 tile_width, gather_dtype):
    if isinstance(bg, BlockedBucketedGraph):
        return _blocked_forward(bg, q, k, v, score, e_row, e_col,
                                negative_slope, tile_width, gather_dtype)
    return _forward(bg, q, k, v, score, e_row, e_col, negative_slope,
                    tile_width, gather_dtype)


# ---------------------------------------------------------------------------
# Custom backward (reference design, fused_gtconv_backward.cu:231-265):
# CSR direction recomputes scores from lse and reduces dQ per row; CSC
# direction (transposed layout) reduces dK/dV per source.  Both are
# gather-based — no scatter-adds.
# ---------------------------------------------------------------------------

def _p_from_scores(s, emask, lse_c):
    """Normalised attention from recomputed scores + saved logsumexp."""
    live = lse_c > _DEAD
    return jnp.where(
        emask[:, None, :] & live[..., None],
        jnp.exp(s - jnp.where(live, lse_c, 0.0)[..., None]),
        0.0,
    )


def _bwd_csr_chunk(args, a_row, do, lse, delta, src, f, score, negative_slope):
    """CSR-direction backward chunk: dQ (dot) or d e_row (add).

    Analog of the reference's ``fused_backward_kernel``
    (``fused_gtconv_backward.cu:74-191``): recompute SDDMM, apply the
    softmax gradient dS = P*(dP - delta), reduce against K per row."""
    row_ids, nbr, emask, val = args
    C, W = nbr.shape
    src_n = _take_src(src, nbr.reshape(-1), C, W)
    k_n, v_n, ec_n = _split_src(src_n, score, f)
    do_c = _take_rows(do, row_ids)
    lse_c = _take_rows(lse, row_ids)
    delta_c = _take_rows(delta, row_ids)
    a_c = _take_rows(a_row, row_ids)
    if score == "dot":
        s = jnp.einsum("chf,cwhf->chw", a_c, k_n)
        pre = None
    else:
        pre = a_c[:, :, None] + ec_n.transpose(0, 2, 1)
        s = jax.nn.leaky_relu(pre, negative_slope=negative_slope)
    if val is not None:
        s = s * val[:, None, :]
    s = jnp.where(emask[:, None, :], s, _NEG_BIG)
    p = _p_from_scores(s, emask, lse_c)
    dp = jnp.einsum("chf,cwhf->chw", do_c, v_n)
    ds = p * (dp - delta_c[..., None])
    if val is not None:
        ds = ds * val[:, None, :]
    if score == "dot":
        return (jnp.einsum("chw,cwhf->chf", ds, k_n),)
    dpre = jnp.where(pre >= 0, ds, ds * negative_slope)
    return (jnp.sum(dpre, axis=2),)        # d e_row [C, h]


def _bwd_csc_chunk(args, b_col, v_full, srcT, f, score, negative_slope):
    """CSC-direction backward chunk over the TRANSPOSED layout: rows are
    sources j; produces (dK_j, dV_j) for dot or (d e_col_j, dV_j) for add.

    Analog of the reference's ``spmm_backward_kernel``
    (``fused_gtconv_backward.cu:41-70``) but gather-based: the transposed
    buckets replace the CSC + edge-permutation arrays."""
    row_ids, nbr, emask, val = args
    C, W = nbr.shape
    src_n = _take_src(srcT, nbr.reshape(-1), C, W)
    if score == "dot":
        q_n = src_n[..., :f]
        do_n = src_n[..., f:2 * f]
        lse_n = src_n[..., 2 * f].transpose(0, 2, 1)     # [C, h, W]
        delta_n = src_n[..., 2 * f + 1].transpose(0, 2, 1)
        k_j = _take_rows(b_col, row_ids)                 # [C, h, f]
        s = jnp.einsum("chf,cwhf->chw", k_j, q_n)
        pre = None
    else:
        do_n = src_n[..., :f]
        er_n = src_n[..., f].transpose(0, 2, 1)          # [C, h, W]
        lse_n = src_n[..., f + 1].transpose(0, 2, 1)
        delta_n = src_n[..., f + 2].transpose(0, 2, 1)
        ec_j = _take_rows(b_col, row_ids)                # [C, h]
        pre = er_n + ec_j[:, :, None]
        s = jax.nn.leaky_relu(pre, negative_slope=negative_slope)
    if val is not None:
        s = s * val[:, None, :]
    s = jnp.where(emask[:, None, :], s, _NEG_BIG)
    live = lse_n > _DEAD
    p = jnp.where(emask[:, None, :] & live,
                  jnp.exp(s - jnp.where(live, lse_n, 0.0)), 0.0)
    v_j = _take_rows(v_full, row_ids)                    # [C, h, f]
    dp = jnp.einsum("chf,cwhf->chw", v_j, do_n)
    ds = p * (dp - delta_n)
    if val is not None:
        ds = ds * val[:, None, :]
    dv_j = jnp.einsum("chw,cwhf->chf", p, do_n)
    if score == "dot":
        dk_j = jnp.einsum("chw,cwhf->chf", ds, q_n)
        return dk_j, dv_j
    dpre = jnp.where(pre >= 0, ds, ds * negative_slope)
    return jnp.sum(dpre, axis=2), dv_j                   # d e_col [C, h]


def _walk_backward(bg, chunk_fn, out_shapes, h, fs, itemsize):
    """Run ``chunk_fn`` over all buckets + segments of a layout; scatter the
    per-row results into zero-initialised outputs [n_nodes+1, ...].
    Backward quantities are plain sums over a row's edges, so segment
    results combine with segment_sum (no online merge needed)."""
    outs = [jnp.zeros((bg.n_nodes + 1,) + s, jnp.float32) for s in out_shapes]
    for b in bg.buckets:
        row_ids, res = _run_bucket(
            b, chunk_fn, itemsize, h, fs,
            fills=(bg.n_nodes, bg.n_nodes, False, 0.0),
        )
        outs = [o.at[row_ids].set(r, mode="drop") for o, r in zip(outs, res)]
    sb = bg.segments
    if sb is not None:
        seg_args_fn = lambda a: chunk_fn(a)
        res = _run_segments(sb, seg_args_fn, itemsize, h, fs)
        R = int(sb.wide_rows.shape[0])
        bins = R + 1
        merged = [_segsum(r, sb.seg_id, bins)[:R] for r in res]
        outs = [o.at[sb.wide_rows].set(m, mode="drop")
                for o, m in zip(outs, merged)]
    return [o[: bg.n_nodes] for o in outs]


def _layout_has_val(bg) -> bool:
    if isinstance(bg, BlockedBucketedGraph):
        return any(_layout_has_val(b) for b in bg.blocks)
    return any(b.val is not None for b in bg.buckets) or (
        bg.segments is not None and bg.segments.val is not None
    )


def _float0_like(x):
    return np.zeros(x.shape, dtype=jax_dtypes.float0)


def _zero_tangents(tree):
    """Cotangents for the (non-differentiated) layout pytree: float0 for
    integer/bool leaves, zeros for float leaves (edge values are treated as
    constants on this path, matching the reference's fixed ``A.val``)."""
    return jax.tree.map(
        lambda x: jnp.zeros_like(x)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else _float0_like(x),
        tree,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bucket_fused(meta, bg, a, b, v):
    score, slope, tile_width = meta
    out, _ = _any_forward(bg, a if score == "dot" else None,
                          b if score == "dot" else None, v, score,
                          a if score == "add" else None,
                          b if score == "add" else None,
                          slope, tile_width, None)
    return out


def _bucket_fused_fwd(meta, bg, a, b, v):
    score, slope, tile_width = meta
    out, lse = _any_forward(bg, a if score == "dot" else None,
                            b if score == "dot" else None, v, score,
                            a if score == "add" else None,
                            b if score == "add" else None,
                            slope, tile_width, None)
    return out, (bg, a, b, v, out, lse)


def _bucket_fused_bwd(meta, res, do):
    score, slope, _ = meta
    bg, a, b, v, out, lse = res
    bgT = bg.transpose
    h, f = v.shape[1], v.shape[2]
    do = do.astype(jnp.float32)
    delta = jnp.einsum("nhf,nhf->nh", do, out.astype(jnp.float32))

    # CSR direction: dQ / d e_row (+ recomputed P against the saved lse)
    src = _pack_src(b if score == "dot" else None, v,
                    b if score == "add" else None, score, None)
    csr_shapes = [(h, f)] if score == "dot" else [(h,)]
    da = None
    for bg_b, sub in _iter_blocks(bg, src):
        csr_fn = lambda args, sub=sub: _bwd_csr_chunk(
            args, a, do, lse, delta, sub, f, score, slope)
        (da_b,) = _walk_backward(bg_b, csr_fn, csr_shapes, h, src.shape[-1],
                                 src.dtype.itemsize)
        da = da_b if da is None else da + da_b

    # CSC direction over the transposed layout: dK / d e_col, and dV
    if score == "dot":
        srcT = jnp.concatenate(
            [a, do, lse[..., None], delta[..., None]], axis=-1)  # [N,h,2f+2]
    else:
        srcT = jnp.concatenate(
            [do, a[..., None], lse[..., None], delta[..., None]], axis=-1)
    csc_shapes = [(h, f), (h, f)] if score == "dot" else [(h,), (h, f)]
    db = dv = None
    for bgT_b, subT in _iter_blocks(bgT, srcT):
        csc_fn = lambda args, subT=subT: _bwd_csc_chunk(
            args, b, v, subT, f, score, slope)
        db_b, dv_b = _walk_backward(bgT_b, csc_fn, csc_shapes, h,
                                    srcT.shape[-1], srcT.dtype.itemsize)
        db = db_b if db is None else db + db_b
        dv = dv_b if dv is None else dv + dv_b

    return (_zero_tangents(bg), da.astype(a.dtype), db.astype(b.dtype),
            dv.astype(v.dtype))


_bucket_fused.defvjp(_bucket_fused_fwd, _bucket_fused_bwd)


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
    gather_dtype=None,
) -> jax.Array:
    """Fused SDDMM -> edge-softmax -> SpMM over all degree buckets.

    ``q,k,v``: ``[n_nodes, h, f]`` (dot) or ``e_row,e_col``: ``[n_nodes, h]``
    (add).  Returns ``[n_nodes, h, f]``; rows with no edges produce zeros.

    When ``bg`` carries a transposed layout (``with_transpose=True``) and
    ``gather_dtype`` is None, gradients flow through the fused custom
    backward (see module docstring); otherwise XLA autodiff applies.

    ``gather_dtype=jnp.bfloat16`` halves the bytes of the gathered source
    table; scores/accumulation stay fp32.  The gather is row-overhead
    bound, so this saves memory rather than time; expect ~1e-2 relative
    error — outside the reference's rtol=1e-3 bar, so it is opt-in.
    """
    if score not in ("dot", "add"):
        raise ValueError(f"unknown score mode {score!r}")
    # The fused custom backward treats edge values as constants (the
    # reference's fixed A.val); when the layout carries val arrays, fall
    # back to XLA autodiff so d(val) propagates if differentiated.
    if (bg.transpose is not None and gather_dtype is None
            and not _layout_has_val(bg)):
        meta = (score, negative_slope, tile_width)
        if score == "dot":
            return _bucket_fused(meta, bg, q, k, v)
        return _bucket_fused(meta, bg, e_row, e_col, v)
    out, _ = _any_forward(bg, q, k, v, score, e_row, e_col, negative_slope,
                          tile_width, gather_dtype)
    return out
