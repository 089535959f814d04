"""Format registry / graph preprocessing.

The TPU analog of the reference's format layer (``DFGNN/layers/util.py``):
where the reference converts a DGL graph into per-strategy CUDA tensor
bundles with a shared-memory budget (``preprocess_CSR`` :66-79,
``preprocess_Hyper`` :82-100, ``preprocess_softmax`` :145-162), we convert a
:class:`~dfgnn_tpu.graph.Graph` into static-shape padded layouts:

* ``bucketed``   — degree-bucketed padded neighbor lists (full graphs; plays
                   the role of the csr / softmax / tiling strategies: the
                   bucket max-degree replaces ``smem_consume``, and buckets
                   whose degree exceeds ``tile_width`` stream neighbor tiles
                   with online softmax exactly like the reference's tiling
                   kernel, ``fused_gtconv_tiling.cu:30-87``).
* ``dense``      — per-graph dense adjacency batch (batched small graphs;
                   plays the role of the hyper format).
* ``reference``  — the raw Graph itself (unfused oracle path).

String-keyed dispatch mirrors ``load_prepfunc`` (``layers/util.py:458-491``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dfgnn_tpu.graph import DenseBatch, Graph, _round_up


@struct.dataclass
class Bucket:
    """Rows whose degree falls in one bucket, with padded neighbor lists.

    ``row_ids`` is padded with the sentinel ``n_nodes`` (writes land in a
    scratch row that is dropped); ``nbr`` is padded with ``n_nodes`` (gathers
    clip; lanes masked by ``emask``).
    """

    row_ids: jax.Array   # [r_pad] int32
    nbr: jax.Array       # [r_pad, width] int32
    emask: jax.Array     # [r_pad, width] bool
    val: Optional[jax.Array] = None   # [r_pad, width] f32
    # CSR edge index per lane (sentinel e_pad); carried when the layout is
    # built with with_edge_ids=True — lets fused paths scatter per-edge
    # artifacts (normalized attention weights) back into edge-list order,
    # the reference softmax strategy's materialized attn_edge
    # (DFGNN/src/fused_gtconv/fused_gtconv_softmax.cu:10-54).
    edge_ids: Optional[jax.Array] = None   # [r_pad, width] int32
    width: int = struct.field(pytree_node=False, default=0)
    n_rows: int = struct.field(pytree_node=False, default=0)  # real rows
    row_chunk: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class SegmentBucket:
    """Fixed-width segments of super-wide rows (degree > ``split_width``).

    A row of degree d occupies ``ceil(d / width)`` consecutive segments, so
    padding waste is bounded by one segment per row — instead of rounding d
    up to the next power-of-two bucket width.  Per-segment partial softmax
    states (m, l, acc) are merged per row with the associative online-softmax
    combine (the reference tiling kernel's rescale algebra,
    ``fused_gtconv_tiling.cu:72-86``, applied across segments).

    ``seg_id`` maps each segment to its compact wide-row index (sorted
    ascending; padding uses the out-of-range bin ``n_rows``);
    ``seg_dst``/``wide_rows`` give destination node ids per segment /
    per compact row.
    """

    nbr: jax.Array        # [s_pad, width] int32 (pad: n_cols sentinel)
    emask: jax.Array      # [s_pad, width] bool
    seg_id: jax.Array     # [s_pad] int32, sorted; pad = n_rows
    seg_dst: jax.Array    # [s_pad] int32 destination node id (pad sentinel)
    wide_rows: jax.Array  # [n_rows] int32 destination node per compact row
    val: Optional[jax.Array] = None   # [s_pad, width] f32
    edge_ids: Optional[jax.Array] = None   # [s_pad, width] int32 (see Bucket)
    width: int = struct.field(pytree_node=False, default=0)
    n_rows: int = struct.field(pytree_node=False, default=0)
    n_segments: int = struct.field(pytree_node=False, default=0)  # real
    row_chunk: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class BucketedGraph:
    """Degree-bucketed padded-CSR layout of one (full) graph."""

    buckets: Tuple[Bucket, ...]
    n_nodes: int = struct.field(pytree_node=False, default=0)
    n_edges: int = struct.field(pytree_node=False, default=0)
    graph_id: Optional[jax.Array] = None
    n_graphs: int = struct.field(pytree_node=False, default=1)
    segments: Optional[SegmentBucket] = None
    # Transposed layout (rows = sources): enables the fused custom backward
    # (the role of the reference's CSC + val_idx arrays,
    # ``DFGNN/layers/util.py:116-142``).
    transpose: Optional["BucketedGraph"] = None
    # Padded edge-array size of the source Graph; > 0 iff the layout was
    # built with with_edge_ids=True (return_weights support).
    e_pad: int = struct.field(pytree_node=False, default=0)

    def device_put(self, sharding=None) -> "BucketedGraph":
        from dfgnn_tpu.graph import device_put

        return device_put(self, sharding)

    @property
    def padded_edges(self) -> int:
        tot = sum(b.row_ids.shape[0] * b.width for b in self.buckets)
        if self.segments is not None:
            tot += self.segments.nbr.shape[0] * self.segments.width
        return tot


@struct.dataclass
class BlockedBucketedGraph:
    """Source-blocked bucketed layout for LARGE full graphs.

    Measured on TPU v5e (scripts/microbench_gather.py, honest
    carry-dependent timing): XLA's random row-gather runs ~2.5x slower
    once the gathered table exceeds a ~100MB knee (10.8 vs 4.2 ns/row at
    1KB packed rows), regardless of index locality.  Splitting the SOURCE
    nodes into blocks of ``block_rows`` and grouping each row's edges by
    source block keeps every gather inside one barriered sub-table slice
    at the fast rate; per-block partial rows merge exactly via their
    logsumexps (the online softmax combine across blocks).  Measured e2e
    (reddit standin, dim 128): 110 ms blocked vs 221 ms flat.

    ``blocks[b]`` is a normal :class:`BucketedGraph` over the SAME row
    space whose ``nbr`` ids are REBASED to block-local (sentinel =
    ``block_rows``); rows with no edge in a block are simply absent from
    its buckets (their lse stays -inf and the merge weight is 0).
    """

    blocks: Tuple[BucketedGraph, ...]
    block_rows: int = struct.field(pytree_node=False, default=0)
    n_nodes: int = struct.field(pytree_node=False, default=0)
    n_edges: int = struct.field(pytree_node=False, default=0)
    graph_id: Optional[jax.Array] = None
    n_graphs: int = struct.field(pytree_node=False, default=1)
    transpose: Optional["BlockedBucketedGraph"] = None
    e_pad: int = struct.field(pytree_node=False, default=0)

    def device_put(self, sharding=None) -> "BlockedBucketedGraph":
        from dfgnn_tpu.graph import device_put

        return device_put(self, sharding)

    @property
    def padded_edges(self) -> int:
        return sum(b.padded_edges for b in self.blocks)


# Edge budget per compute chunk (rows-at-once x bucket width); bounds the
# size of gathered [chunk, width, h, f] temporaries.
_EDGE_CHUNK = 1 << 15

# Source-block size (rows) and the node count above which blocking kicks
# in automatically: at the canonical dim-128 fp32 config the k||v table is
# 1KB/row, so 81920 rows = 80MB — under the measured ~100MB fast-gather
# knee with headroom for the barriered slice copy.
_SRC_BLOCK_ROWS = 81920
_AUTO_BLOCK_ABOVE = 131072


def bucket_rows_numpy(
    indptr: np.ndarray,
    cols: np.ndarray,
    val: Optional[np.ndarray],
    *,
    n_rows_space: int,
    n_cols_space: int,
    min_width: int = 8,
    edge_chunk: int = _EDGE_CHUNK,
    widths: Optional[Sequence[int]] = None,
    row_pad_to: Optional[dict] = None,
    edge_index_map: Optional[np.ndarray] = None,
):
    """Host-side core of :func:`build_buckets` over raw CSR arrays.

    ``n_rows_space``/``n_cols_space`` are the sentinel pad indices for the
    row-id and neighbor-id spaces (they differ for edge-partitioned graphs,
    where rows are device-local and neighbors are global).  ``row_pad_to``
    optionally forces ``{width: r_pad}`` so multiple partitions produce
    identical shapes (SPMD requirement).  ``edge_index_map`` (when given)
    turns on per-lane edge ids: a ``(vals, sentinel)`` pair where lane
    (i, j) records ``vals[local_csr_edge]`` (``vals=None`` = identity =
    CSR edge order) and padded lanes carry ``sentinel`` (callers pass a
    value >= the scatter target size so mode="drop" discards them).
    Returns a list of Buckets.
    """
    deg = indptr[1:] - indptr[:-1]
    n_r = len(deg)

    if widths is None:
        max_deg = int(deg.max()) if n_r > 0 else 0
        widths = []
        w = min_width
        while True:
            widths.append(w)
            if w >= max_deg:
                break
            w *= 2

    buckets = []
    lo = 0
    for w in widths:
        sel = np.nonzero((deg > lo) & (deg <= w))[0]
        lo = w
        r = sel.size
        # cap the chunk at the (rounded) real row count: tiny buckets must
        # not round up to a full compute chunk of sentinel rows (padded
        # rows still cost real gathers)
        chunk = max(8, min(edge_chunk // w, _round_up(max(r, 1), 8)))
        if row_pad_to is not None:
            r_pad = row_pad_to.get(w, 0)
            if r_pad == 0:
                continue
            assert r <= r_pad, (r, r_pad)
        else:
            if r == 0:
                continue
            r_pad = _round_up(r, chunk)
        # r_pad need not be a chunk multiple: runtime chunking
        # (ops.bucket._chunk_args) pads any remainder itself.
        row_ids = np.full(r_pad, n_rows_space, dtype=np.int32)
        row_ids[:r] = sel
        nbr = np.full((r_pad, w), n_cols_space, dtype=np.int32)
        emask = np.zeros((r_pad, w), dtype=bool)
        bval = None if val is None else np.zeros((r_pad, w), dtype=np.float32)
        from dfgnn_tpu import native

        if not native.bucket_fill(sel, indptr, cols, val, w, nbr, emask, bval):
            for i, rid in enumerate(sel):
                s, e = indptr[rid], indptr[rid + 1]
                d = e - s
                nbr[i, :d] = cols[s:e]
                emask[i, :d] = True
                if bval is not None:
                    bval[i, :d] = val[s:e]
        beid = None
        if edge_index_map is not None:
            evals, esent = edge_index_map
            beid = np.full((r_pad, w), esent, dtype=np.int32)
            if r > 0:
                deg_sel = (indptr[sel + 1] - indptr[sel]).astype(np.int64)
                er = np.repeat(np.arange(r), deg_sel)
                within = np.arange(int(deg_sel.sum())) - np.repeat(
                    np.cumsum(deg_sel) - deg_sel, deg_sel)
                local = np.repeat(indptr[sel], deg_sel) + within
                beid[er, within] = (local if evals is None
                                    else evals[local]).astype(np.int32)
        buckets.append(
            Bucket(
                row_ids=row_ids,
                nbr=nbr,
                emask=emask,
                val=bval,
                edge_ids=beid,
                width=int(w),
                n_rows=int(r),
                row_chunk=int(chunk),
            )
        )
    return buckets


def _width_ladder(min_width: int, max_w: int, cap: bool = False,
                  style: str = "x1.5") -> list:
    """Geometric width ladder.  ``style="x1.5"`` (8, 12, 16, 24, 32, ...)
    averages ~17% per-row padding vs ~33% for ``style="pow2"`` — but twice
    the rung count, and each rung is a separate bucket walk with fixed
    overhead, so coarse ladders can win on time despite more padded edges
    (measured on reddit-standin: min_width=16 beat min_width=8 by 14%).

    With ``cap=True`` the last rung is trimmed to exactly ``max_w`` so the
    ladder never overshoots it — required when rows above ``max_w`` go to
    the segment layout, which must never double-cover a row with an
    overshooting bucket."""
    widths = []
    w = min_width
    while True:
        widths.append(w)
        if w >= max_w:
            break
        if style == "x1.5":
            widths.append(w + w // 2)
            if w + w // 2 >= max_w:
                break
        w *= 2
    if cap:
        widths[-1] = min(widths[-1], max(max_w, min_width))
        if len(widths) >= 2 and widths[-1] <= widths[-2]:
            widths.pop()
    return widths


def segment_rows_numpy(
    indptr: np.ndarray,
    cols: np.ndarray,
    val: Optional[np.ndarray],
    sel: np.ndarray,
    *,
    width: int,
    n_rows_space: int,
    n_cols_space: int,
    edge_chunk: int = _EDGE_CHUNK,
    s_pad_to: Optional[int] = None,
    r_pad_to: Optional[int] = None,
    edge_index_map=None,
) -> Optional[SegmentBucket]:
    """Lay the rows in ``sel`` out as fixed-``width`` edge segments.

    ``s_pad_to``/``r_pad_to`` force the padded segment/row counts so
    multiple partitions produce identical shapes (SPMD requirement);
    padded rows scatter to the ``n_rows_space`` sentinel and are dropped.
    """
    if sel.size == 0 and s_pad_to is None:
        return None
    deg = (indptr[1:] - indptr[:-1])[sel]
    R = int(sel.size)
    R_pad = R if r_pad_to is None else int(r_pad_to)
    nseg = -(-deg // width)
    S = int(nseg.sum())
    chunk = max(8, edge_chunk // width)
    s_pad = _round_up(S, chunk) if s_pad_to is None else int(s_pad_to)
    assert S <= s_pad and R <= R_pad, (S, s_pad, R, R_pad)

    seg_id = np.full(s_pad, R_pad, dtype=np.int32)
    seg_id[:S] = np.repeat(np.arange(R, dtype=np.int32), nseg)
    seg_dst = np.full(s_pad, n_rows_space, dtype=np.int32)
    seg_dst[:S] = np.repeat(sel.astype(np.int32), nseg)

    # vectorized per-edge fill
    E_w = int(deg.sum())
    edge_row = np.repeat(np.arange(R), deg)                       # compact row
    within = np.arange(E_w) - np.repeat(np.cumsum(deg) - deg, deg)
    seg_start = np.cumsum(nseg) - nseg
    seg_of_edge = seg_start[edge_row] + within // width
    lane = within % width
    edge_idx = np.repeat(indptr[sel], deg) + within
    nbr = np.full((s_pad, width), n_cols_space, dtype=np.int32)
    emask = np.zeros((s_pad, width), dtype=bool)
    nbr[seg_of_edge, lane] = cols[edge_idx]
    emask[seg_of_edge, lane] = True
    bval = None
    if val is not None:
        bval = np.zeros((s_pad, width), dtype=np.float32)
        bval[seg_of_edge, lane] = val[edge_idx]
    seid = None
    if edge_index_map is not None:
        evals, esent = edge_index_map
        seid = np.full((s_pad, width), esent, dtype=np.int32)
        seid[seg_of_edge, lane] = (
            edge_idx if evals is None else evals[edge_idx]).astype(np.int32)
    wide_rows = np.full(R_pad, n_rows_space, dtype=np.int32)
    wide_rows[:R] = sel
    return SegmentBucket(
        nbr=nbr, emask=emask, seg_id=seg_id, seg_dst=seg_dst,
        wide_rows=wide_rows, val=bval, edge_ids=seid,
        width=int(width), n_rows=R, n_segments=S, row_chunk=int(chunk),
    )


def _bucketize(indptr, cols, val, *, n_rows_space, n_cols_space,
               min_width, edge_chunk, widths, split_width,
               edge_index_map=None, ladder="x1.5"):
    """Shared core: ladder buckets + segment split over raw CSR arrays.

    Explicit ``widths`` compose with ``split_width``: rows wider than the
    split go to segments, and the width list must then cover exactly up to
    ``split_width`` (asserted) so no row is dropped."""
    deg = indptr[1:] - indptr[:-1]
    max_deg = int(deg.max()) if len(deg) else 0
    segments = None
    if split_width is not None and max_deg > split_width:
        sel = np.nonzero(deg > split_width)[0]
        segments = segment_rows_numpy(
            indptr, cols, val, sel,
            width=split_width, n_rows_space=n_rows_space,
            n_cols_space=n_cols_space, edge_chunk=edge_chunk,
            edge_index_map=edge_index_map,
        )
        if widths is None:
            widths = _width_ladder(min_width, split_width, cap=True,
                                   style=ladder)
        else:
            assert widths[-1] >= split_width, (
                "explicit widths must cover split_width (rows in "
                f"({widths[-1]}, {split_width}] would be dropped)")
            widths = [w for w in widths if w <= split_width]
            if widths[-1] < split_width:
                widths.append(split_width)
    elif widths is None:
        widths = _width_ladder(min_width, max_deg, style=ladder)
    else:
        assert max_deg <= widths[-1], (
            f"explicit widths top out at {widths[-1]} but max degree is "
            f"{max_deg}; rows would be dropped (set split_width)")
    buckets = bucket_rows_numpy(
        indptr, cols, val,
        n_rows_space=n_rows_space,
        n_cols_space=n_cols_space,
        min_width=min_width,
        edge_chunk=edge_chunk,
        widths=widths,
        edge_index_map=edge_index_map,
    )
    return tuple(buckets), segments


def _build_blocked(
    g: Graph, block_rows: int, *,
    min_width, edge_chunk, widths, split_width, with_transpose,
    with_edge_ids=False, ladder="x1.5",
) -> "BlockedBucketedGraph":
    n = g.n_nodes
    e = g.n_edges
    rows = np.asarray(g.rows)[:e]
    cols = np.asarray(g.cols)[:e]
    val = None if g.val is None else np.asarray(g.val)[:e]
    nb = -(-n // block_rows)
    blocks = []
    for b in range(nb):
        lo = b * block_rows
        hi = min(lo + block_rows, n)
        m = (cols >= lo) & (cols < hi)
        rb = rows[m]                      # still row-sorted
        cb = (cols[m] - lo).astype(np.int64)
        vb = None if val is None else val[m]
        eim = None
        if with_edge_ids:
            # block-local CSR edge j is original edge orig[j]
            eim = (np.nonzero(m)[0].astype(np.int64), g.e_pad)
        ip = np.zeros(n + 1, np.int64)
        np.add.at(ip, rb + 1, 1)
        ip = np.cumsum(ip)
        bks, segs = _bucketize(
            ip, cb, vb, n_rows_space=n, n_cols_space=block_rows,
            min_width=min_width, edge_chunk=edge_chunk,
            widths=widths, split_width=split_width, edge_index_map=eim,
            ladder=ladder,
        )
        blocks.append(BucketedGraph(
            buckets=bks, n_nodes=n, n_edges=int(rb.size), segments=segs,
        ))
    transpose = None
    if with_transpose:
        gT = Graph.from_coo(cols, rows, n,
                            val=None if val is None else val)
        transpose = _build_blocked(
            gT, block_rows, min_width=min_width, edge_chunk=edge_chunk,
            widths=widths, split_width=split_width, with_transpose=False,
            ladder=ladder,
        )
    return BlockedBucketedGraph(
        blocks=tuple(blocks), block_rows=int(block_rows),
        n_nodes=n, n_edges=e, graph_id=g.graph_id, n_graphs=g.n_graphs,
        transpose=transpose, e_pad=g.e_pad if with_edge_ids else 0,
    )


def build_buckets(
    g: Graph,
    *,
    min_width: int = 16,
    edge_chunk: int = _EDGE_CHUNK,
    widths: Optional[Sequence[int]] = None,
    split_width: Optional[int] = 64,
    with_transpose: bool = False,
    with_edge_ids: bool = False,
    src_block_rows="auto",
    ladder: str = "pow2",
) -> BucketedGraph:
    """Host-side: split rows into degree buckets (padded neighbor lists) and
    lay super-wide rows (degree > ``split_width``) out as fixed-width edge
    segments merged by online softmax.

    Replaces the reference's dynamic-shared-memory sizing
    (``smem_consume``, ``layers/util.py:66-100``) with static compile-time
    widths.  The gather is per-row-overhead bound on TPU, so padded-edge
    count is the cost model: the ~x1.5 ladder + segment splitting keeps
    padding to ~1.1x on power-law graphs (vs ~1.5x for pure power-of-two
    buckets).  ``split_width=None`` disables splitting (the pure-bucket
    layout; super-wide buckets then stream via the online-softmax tiled
    path).

    ``with_transpose=True`` additionally builds the transposed layout
    (training preprocessing, analog of ``preprocess_Hyper_fw_bw``'s CSC
    arrays, ``DFGNN/layers/util.py:116-142``) so gradients take the fused
    custom backward instead of XLA's scatter-add transpose.

    ``src_block_rows`` (default ``"auto"``): on graphs above
    ``_AUTO_BLOCK_ABOVE`` nodes, returns a :class:`BlockedBucketedGraph`
    whose gathers stay inside fast-rate sub-tables (see that class's
    docstring).  Pass ``None`` to force the flat layout or an int to force
    a block size.
    """
    n = g.n_nodes
    if src_block_rows == "auto":
        src_block_rows = _SRC_BLOCK_ROWS if n > _AUTO_BLOCK_ABOVE else None
    if src_block_rows:
        return _build_blocked(
            g, int(src_block_rows), min_width=min_width,
            edge_chunk=edge_chunk, widths=widths, split_width=split_width,
            with_transpose=with_transpose, with_edge_ids=with_edge_ids,
            ladder=ladder,
        )
    indptr = np.asarray(g.indptr, dtype=np.int64)
    cols = np.asarray(g.cols)
    val = None if g.val is None else np.asarray(g.val)

    buckets, segments = _bucketize(
        indptr, cols, val, n_rows_space=n, n_cols_space=n,
        min_width=min_width, edge_chunk=edge_chunk,
        widths=widths, split_width=split_width,
        edge_index_map=(None, g.e_pad) if with_edge_ids else None,
        ladder=ladder,
    )
    transpose = None
    if with_transpose:
        e = g.n_edges
        rows_np = np.asarray(g.rows)[:e]
        cols_np = np.asarray(g.cols)[:e]
        val_np = None if g.val is None else np.asarray(g.val)[:e]
        gT = Graph.from_coo(cols_np, rows_np, n, val=val_np)
        transpose = build_buckets(
            gT, min_width=min_width, edge_chunk=edge_chunk,
            split_width=split_width, with_transpose=False,
            src_block_rows=None, ladder=ladder,
        )
    return BucketedGraph(
        buckets=tuple(buckets),
        n_nodes=n,
        n_edges=g.n_edges,
        graph_id=g.graph_id,
        n_graphs=g.n_graphs,
        segments=segments,
        transpose=transpose,
        e_pad=g.e_pad if with_edge_ids else 0,
    )


# ---------------------------------------------------------------------------
# String-keyed dispatch (parity with load_prepfunc, layers/util.py:458-491)
# ---------------------------------------------------------------------------

def preprocess(fmt: str, g: Graph, **kw):
    """Convert a Graph to the layout a given strategy consumes."""
    if fmt in ("reference", "pyg", "csr", "softmax", "hyper_coo"):
        return g
    if fmt in ("bucketed", "tiling", "csr_gm", "softmax_gm"):
        return build_buckets(g, **kw)
    if fmt in ("two_phase", "softmax_fused"):
        # materialized-score layout: fused paths can scatter normalized
        # attention weights back to edge order (reference softmax strategy,
        # fused_gtconv_softmax.cu:10-54)
        kw.setdefault("with_edge_ids", True)
        return build_buckets(g, **kw)
    if fmt in ("bucketed_train", "hyper_fw_bw"):
        # training layout with transpose (ref: preprocess_Hyper_fw_bw,
        # DFGNN/layers/util.py:116-142)
        return build_buckets(g, with_transpose=True, **kw)
    raise KeyError(f"unknown format {fmt!r}")
