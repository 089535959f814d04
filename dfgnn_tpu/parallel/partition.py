"""Edge-partitioned full-graph attention across a device mesh.

The new multi-chip capability (no reference counterpart — DF-GNN is
single-GPU, SURVEY.md section 2.3): one large graph's edges are partitioned
by **destination row block** across devices, so edge-softmax stays entirely
chip-local; only source features (k/v or GAT column scalars) are remote and
are fetched with an ``all_gather`` over the mesh axis inside ``shard_map``,
overlapped by XLA with local aggregation.  This is the graph analog of
sequence parallelism: destination-partitioning == "each chip owns a slice
of query rows", all-gather of sources == "KV all-gather".

SPMD requires identical shapes per device, so partitions are built with a
*harmonized* layout: same widths list, same padded row counts per bucket
(``formats.bucket_rows_numpy(row_pad_to=...)``) and, for super-wide rows,
same padded segment counts (``segment_rows_numpy(s_pad_to=...)``).

Autodiff works end-to-end.  By default it goes through XLA (the transpose
of ``all_gather`` is ``psum_scatter``); ``with_transpose=True`` switches
training to the fused distributed custom backward (see ``_dist_fused``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dfgnn_tpu.formats import (
    Bucket, BucketedGraph, SegmentBucket, _width_ladder, bucket_rows_numpy,
    segment_rows_numpy,
)
from dfgnn_tpu.graph import Graph, _round_up
from dfgnn_tpu.ops.bucket import bucket_graph_attention


@struct.dataclass
class EdgePartitionedGraph:
    """Per-device bucketed CSR slices, stacked on a leading device axis.

    ``buckets[i]`` arrays have shape ``[n_devices, r_pad_i(, width_i)]`` —
    shard dim 0 over the mesh.  ``row_ids`` are device-local (0..n_local,
    sentinel n_local); ``nbr`` are global node ids (sentinel n_nodes).
    """

    buckets: Tuple[Bucket, ...]
    n_nodes: int = struct.field(pytree_node=False, default=0)   # global, padded
    n_local: int = struct.field(pytree_node=False, default=0)   # rows per device
    n_devices: int = struct.field(pytree_node=False, default=0)
    n_edges: int = struct.field(pytree_node=False, default=0)
    mesh: Optional[Mesh] = struct.field(pytree_node=False, default=None)
    axis: str = struct.field(pytree_node=False, default="data")
    halo: Optional["HaloExchange"] = None
    # Fixed-width segments of super-wide rows, stacked on the device axis
    # (shape-harmonized across devices); see formats.SegmentBucket.
    segments: Optional[SegmentBucket] = None
    # Globally-dealt alternative to ``segments`` (the default for the
    # all-gather exchange): equal contiguous shares of the GLOBAL segment
    # list, cross-device lse merge.  See SharedSegments.
    shared_segments: Optional["SharedSegments"] = None
    # Source-partitioned transpose (same row blocks): enables the fused
    # distributed custom backward (CSC-direction dK/dV), the multi-chip
    # analog of the reference's CSC arrays (fused_gtconv_backward.cu:41-70).
    transpose: Optional["EdgePartitionedGraph"] = None
    # Locality reordering (partition_graph(reorder="bfs")): node features
    # enter permuted (x[perm]) and outputs return in original order
    # (out[rank]); None = identity.
    node_perm: Optional[jax.Array] = None   # [n] old ids in new order
    node_rank: Optional[jax.Array] = None   # [n] rank[old] = new

    def comm_rows_per_device(self) -> int:
        """Rows each device receives per exchanged operand per layer —
        the comm-volume model (multiply by row bytes for bytes/step)."""
        if self.halo is not None:
            return (self.n_devices - 1) * self.halo.max_halo
        return (self.n_devices - 1) * self.n_local

    @property
    def padded_edges(self) -> int:
        tot = sum(int(np.prod(b.nbr.shape)) for b in self.buckets)
        if self.segments is not None:
            tot += int(np.prod(self.segments.nbr.shape))
        if self.shared_segments is not None:
            tot += int(np.prod(self.shared_segments.nbr.shape))
        return tot


@struct.dataclass
class HaloExchange:
    """Boundary-node exchange plan (comm O(halo), not O(n_nodes)).

    Each device d needs, from each peer e, the rows ``need[d][e]`` that d's
    local edges reference; equivalently each device e must SEND
    ``send[e][d] = need[d][e]`` to d.  ``send_local`` stores those as
    e-LOCAL row indices, stacked on a leading device axis and harmonized to
    a shared ``max_halo`` so the exchange is one static-shape
    ``all_to_all`` over the mesh axis (ICI).  When a partition carries a
    halo plan, its bucket ``nbr`` ids are REMAPPED into the local source
    table ``[x_local ++ recv(n_devices*max_halo) ++ zero-row]``.
    """

    send_local: jax.Array  # [n_devices(me), n_devices(dst), max_halo] int32
    max_halo: int = struct.field(pytree_node=False, default=0)
    # Inverse of the neighbor-id remap: global node id of every local
    # source-table row, [n_devices, table_rows + 1] int32 (last row = the
    # appended zero row; padding maps to the n_nodes sentinel).  Consumed
    # by attention dropout, whose edge hash must key on GLOBAL (dst, src)
    # ids so the mask agrees with the single-chip layouts
    # (ops.bucket._drop_ctx).
    table_global: Optional[jax.Array] = None


@struct.dataclass
class SharedSegments:
    """Globally-dealt fixed-width segments of super-wide rows.

    The per-device harmonized segment layout pads every device to the MAX
    per-device segment count; because a single super row's segments
    cannot be split across devices there, one such row (e.g. a ~30k-degree
    reddit node = ~118 width-256 segments) lower-bounds every device's
    pad, and the waste grows linearly with P (measured: the dominant term
    of the 1.55x padded factor at P=256, NOTES_r5.md item 1).

    Here the GLOBAL segment list is instead split into equal contiguous
    per-device shares (``nbr[d]`` = device d's share — pad is one tail
    round-up total, P-independent).  A segment's destination row may live
    on any device: per-segment partial softmax states (m, l, acc) are
    reduced locally per wide row, lse-merged across the mesh with
    pmax + psum (the ring-attention-style combine of SURVEY.md section
    5.7 / the reference tiling kernel's rescale algebra applied across
    devices, ``fused_gtconv_tiling.cu:72-86``), and each row's owner
    device writes the merged result.  The collective payload is
    O(R * h * f) for R wide rows — negligible next to the feature
    all-gather.
    """

    nbr: jax.Array      # [n_devices, s_loc, width] global (permuted) ids
    emask: jax.Array    # [n_devices, s_loc, width] bool
    seg_id: jax.Array   # [n_devices, s_loc] wide-row ordinal j (pad: R)
    val: Optional[jax.Array] = None      # [n_devices, s_loc, width]
    wide_rows: Optional[jax.Array] = None  # [R] global (permuted) row ids
    # [R+1] ORIGINAL global ids (+ n sentinel): dropout-hash row ids
    drop_rows: Optional[jax.Array] = None
    width: int = struct.field(pytree_node=False, default=0)
    n_rows: int = struct.field(pytree_node=False, default=0)       # R
    n_segments: int = struct.field(pytree_node=False, default=0)   # global S


def _plan_widths(deg: np.ndarray, min_width: int, split_width: int, widths):
    """The (widths, use_segments) bucket plan partition_graph will use —
    shared with the balance pass so both see identical classes."""
    max_deg = int(deg.max()) if deg.size else 0
    use_segments = widths is None and max_deg > split_width
    if widths is None:
        widths = _width_ladder(
            min_width, min(max_deg, split_width) if use_segments else max_deg,
            cap=use_segments,
        )
    return widths, use_segments


def partition_graph(
    g: Graph,
    n_devices: int,
    *,
    min_width: int = 8,
    widths=None,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    halo: bool = False,
    with_transpose: bool = False,
    split_width: int = 256,
    reorder: Optional[str] = None,
    balance: Optional[bool] = None,
) -> EdgePartitionedGraph:
    """Host-side: split rows into ``n_devices`` contiguous blocks and build
    shape-harmonized per-device buckets.

    ``halo=True`` builds a :class:`HaloExchange` plan: neighbor ids are
    remapped into per-device source tables and only boundary rows are
    exchanged (one ``all_to_all``), so per-step comm is O(halo) instead of
    the default all-gather's O(n_nodes).  Wins when the partition has
    locality (clustered/community graphs); on locality-free random graphs
    the halo approaches all-of-peer and the default is equivalent.

    ``reorder="bfs"`` applies a locality-aware node permutation before the
    contiguous blocking (Cuthill-McKee-style BFS, see
    :mod:`dfgnn_tpu.parallel.reorder`), so halo mode wins by default on
    community graphs even when input node ids are shuffled.  Features are
    permuted on entry and outputs returned in original order.

    ``balance`` (default: on for the all-gather exchange, off when
    ``halo`` or ``reorder`` signal locality intent) applies a
    degree-balanced row->device permutation (:mod:`.balance`) so the
    SPMD-harmonized padded-edge factor stays P-independent instead of
    growing with device count.  It destroys id locality — irrelevant for
    the default all-gather exchange (node order does not change its comm
    volume), but fatal for halo compression — hence the default.  Passing
    ``balance=True`` explicitly always wins (applied AFTER any locality
    reorder, undoing it)."""
    n = g.n_nodes
    do_balance = ((balance if balance is not None
                   else (reorder is None and not halo))
                  and n_devices > 1 and n > 0)
    if reorder or do_balance:
        from dfgnn_tpu.parallel.reorder import (
            bfs_reorder, lpa_reorder, reorder_graph,
        )

        e = g.n_edges
        r_ = np.asarray(g.rows)[:e]
        c_ = np.asarray(g.cols)[:e]
        perm = np.arange(n, dtype=np.int64)
        if reorder:
            if reorder not in ("bfs", "lpa"):
                raise ValueError(f"unknown reorder {reorder!r}")
            fn = lpa_reorder if reorder == "lpa" else bfs_reorder
            p1 = fn(r_, c_, n)
            r_, c_, _ = reorder_graph(r_, c_, n, p1)
            perm = perm[p1]
        if do_balance:
            from dfgnn_tpu.parallel.balance import balance_perm

            deg = np.bincount(r_, minlength=n)
            w_, use_seg = _plan_widths(deg, min_width, split_width, widths)
            p2 = balance_perm(deg, n_devices, w_, split_width, use_seg)
            r_, c_, _ = reorder_graph(r_, c_, n, p2)
            perm = perm[p2]
        rank = np.empty(n, np.int64)
        rank[perm] = np.arange(n)
        g2 = Graph.from_coo(
            r_, c_, n, val=None if g.val is None else np.asarray(g.val)[:e])
        pg = partition_graph(
            g2, n_devices, min_width=min_width, widths=widths, mesh=mesh,
            axis=axis, halo=halo, with_transpose=with_transpose,
            split_width=split_width, reorder=None, balance=False)
        np32, nr32 = perm.astype(np.int32), rank.astype(np.int32)
        if pg.transpose is not None:
            # same node blocks, same permutation: attach it so the fused
            # backward's dropout hash can map back to original ids too
            pg = pg.replace(transpose=pg.transpose.replace(
                node_perm=np32, node_rank=nr32))
        if pg.shared_segments is not None:
            # dropout-hash row ids must be ORIGINAL global ids
            ss = pg.shared_segments
            dr = np.concatenate([np32[np.asarray(ss.wide_rows)],
                                 [n]]).astype(np.int32)
            pg = pg.replace(shared_segments=ss.replace(drop_rows=dr))
        return pg.replace(node_perm=np32, node_rank=nr32)
    n_local = _round_up(n, n_devices) // n_devices
    indptr = np.asarray(g.indptr, dtype=np.int64)
    cols = np.asarray(g.cols)
    val = None if g.val is None else np.asarray(g.val)

    # widths shared across devices; rows wider than split_width go to the
    # fixed-width segment layout (harmonized below)
    deg = indptr[1:] - indptr[:-1]
    widths, use_segments = _plan_widths(deg, min_width, split_width, widths)

    # first pass: per-device bucket row counts -> harmonized r_pad
    per_dev = []
    for d in range(n_devices):
        # clamp both ends: with n << n_devices * n_local, whole tail
        # devices can be empty (their blocks start past the last row)
        lo_r, hi_r = min(d * n_local, n), min((d + 1) * n_local, n)
        ip = indptr[lo_r : hi_r + 1] - indptr[lo_r]
        if len(ip) < n_local + 1:  # pad rows with degree 0
            ip = np.concatenate([ip, np.full(n_local + 1 - len(ip), ip[-1])])
        cs = cols[indptr[lo_r] : indptr[hi_r]]
        vs = None if val is None else val[indptr[lo_r] : indptr[hi_r]]
        per_dev.append((ip, cs, vs))

    halo_plan = None
    n_cols_space = n
    if halo and n_devices > 1:
        # Vectorized halo-plan build: one sort/unique over (device, col)
        # replaces the former O(P^2) nested per-pair np.unique loops and
        # the O(P*N) per-device remap tables (measured: reddit-standin at
        # 256 virtual devices builds in seconds; see NOTES_r4.md).
        #
        # need[d][e]: global source ids owned by peer e that device d's
        # edges reference; send[e][d] = need[d][e] as e-local indices.
        all_cols = np.concatenate([cs for _, cs, _ in per_dev])
        all_dev = np.repeat(
            np.arange(n_devices, dtype=np.int64),
            [cs.size for _, cs, _ in per_dev])
        # unique (d, col) pairs, sorted by (d, col) — so within one d the
        # halo groups (d, owner=e) are contiguous and internally sorted,
        # reproducing np.unique's per-pair order
        key = all_dev * n + all_cols.astype(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        d_of = (uk // n).astype(np.int64)
        col_of = (uk % n).astype(np.int64)
        own_of = col_of // n_local
        is_halo = own_of != d_of
        grp = d_of * n_devices + own_of              # sorted (uk is sorted)
        # rank of each unique pair within its (d, owner) group
        starts = np.searchsorted(grp, np.arange(n_devices * n_devices))
        rank = np.arange(uk.size, dtype=np.int64) - starts[grp]
        counts = np.bincount(grp[is_halo], minlength=n_devices * n_devices)
        mx = int(counts.max()) if counts.size else 0
        H = max(8, _round_up(mx, 8))
        send_local = np.zeros((n_devices, n_devices, H), np.int32)
        # send[e][d][rank] = e-local index of the rank-th needed id
        eh, dh, rh = own_of[is_halo], d_of[is_halo], rank[is_halo]
        send_local[eh, dh, rh] = (col_of[is_halo] - eh * n_local).astype(np.int32)
        table_rows = n_local + n_devices * H
        # local-table row of every unique (d, col) pair + the inverse
        # (global id per table row) for dropout
        table_of = np.where(
            is_halo, n_local + own_of * H + rank, col_of - d_of * n_local
        ).astype(np.int32)
        table_global = np.full((n_devices, table_rows + 1), n, np.int32)
        rr = np.arange(n_local, dtype=np.int64)
        owned = (rr[None, :] + np.arange(n_devices)[:, None] * n_local)
        valid = owned < n
        table_global[:, :n_local][valid] = owned[valid].astype(np.int32)
        table_global[d_of, table_of] = col_of.astype(np.int32)
        # remap each device's neighbor ids into its local source table
        remapped = table_of[inv]
        off = 0
        for d in range(n_devices):
            ip, cs, vs = per_dev[d]
            per_dev[d] = (ip, remapped[off:off + cs.size], vs)
            off += cs.size
        n_cols_space = table_rows  # sentinel -> appended zero row (clip)
        halo_plan = HaloExchange(send_local=send_local, max_halo=H,
                                 table_global=table_global)

    row_pad_to = {}
    for w_i, w in enumerate(widths):
        lo = 0 if w_i == 0 else widths[w_i - 1]
        mx = 0
        for ip, _, _ in per_dev:
            dg = ip[1:] - ip[:-1]
            mx = max(mx, int(((dg > lo) & (dg <= w)).sum()))
        if mx:
            # exact max — no host alignment: the bucket walk re-chunks at
            # runtime (_chunk_args pads to its VMEM-budget chunk with
            # sentinel fills), so any coarser host granularity is pure
            # padded-edge waste, and it was the dominant residual of the
            # harmonized padding growth at high device counts
            # (NOTES_r5.md item 1)
            row_pad_to[w] = mx

    all_buckets = []
    for ip, cs, vs in per_dev:
        bks = bucket_rows_numpy(
            ip, cs, vs,
            n_rows_space=n_local,
            n_cols_space=n_cols_space,
            widths=widths,
            row_pad_to=row_pad_to,
        )
        all_buckets.append(bks)

    # stack per width across devices
    stacked = []
    for i in range(len(all_buckets[0])):
        per = [bks[i] for bks in all_buckets]
        b0 = per[0]
        stacked.append(
            Bucket(
                row_ids=np.stack([np.asarray(b.row_ids) for b in per]),
                nbr=np.stack([np.asarray(b.nbr) for b in per]),
                emask=np.stack([np.asarray(b.emask) for b in per]),
                val=None if b0.val is None else np.stack([np.asarray(b.val) for b in per]),
                width=b0.width,
                n_rows=max(b.n_rows for b in per),
                row_chunk=b0.row_chunk,
            )
        )
    segments = None
    shared = None
    if use_segments and not halo and not with_transpose and n_devices > 1:
        # default all-gather exchange: globally-dealt shared segments
        # (P-independent padding; cross-device lse merge).  halo mode
        # keeps the per-device scheme (its nbr remap and per-device edge
        # ownership assume row-local segments), as does with_transpose
        # (the fused custom backward walks per-device segments).
        shared = _build_shared_segments(indptr, cols, val, split_width, n,
                                        n_devices)
    elif use_segments:
        # harmonize segment/row pads across devices, then stack.  Align
        # the segment count to 64 (the runtime _pick_chunk granule at the
        # default dim-128 fp32 row bytes, so _run_segments' divisibility
        # fallback lands on a wide chunk) — or just 8 when the per-device
        # segment count is itself tiny (then the walk is a single chunk
        # of exactly s_pad and no alignment is needed).
        sels, S_max, R_max = [], 0, 0
        for ip, _, _ in per_dev:
            dg = ip[1:] - ip[:-1]
            sel = np.nonzero(dg > split_width)[0]
            sels.append(sel)
            R_max = max(R_max, sel.size)
            S_max = max(S_max, int((-(-dg[sel] // split_width)).sum()))
        if R_max:
            chunk = 64 if S_max >= 64 else 8
            s_pad = _round_up(max(S_max, 1), chunk)
            per_seg = [
                segment_rows_numpy(
                    ip, cs, vs, sel,
                    width=split_width, n_rows_space=n_local,
                    n_cols_space=n_cols_space,
                    s_pad_to=s_pad, r_pad_to=R_max,
                )
                for (ip, cs, vs), sel in zip(per_dev, sels)
            ]
            st = lambda f: np.stack([np.asarray(f(s)) for s in per_seg])
            segments = SegmentBucket(
                nbr=st(lambda s: s.nbr), emask=st(lambda s: s.emask),
                seg_id=st(lambda s: s.seg_id), seg_dst=st(lambda s: s.seg_dst),
                wide_rows=st(lambda s: s.wide_rows),
                val=None if per_seg[0].val is None else st(lambda s: s.val),
                width=split_width, n_rows=R_max,
                n_segments=max(s.n_segments for s in per_seg),
                row_chunk=chunk,
            )

    transpose = None
    if with_transpose:
        e = g.n_edges
        gT = Graph.from_coo(
            np.asarray(g.cols)[:e], np.asarray(g.rows)[:e], n,
            val=None if g.val is None else np.asarray(g.val)[:e],
        )
        # balance=False is REQUIRED: the transposed layout must use the
        # exact same node blocks as the forward partition (any further
        # permutation here would desynchronize the two directions of the
        # fused backward)
        transpose = partition_graph(
            gT, n_devices, min_width=min_width, widths=None,
            mesh=mesh, axis=axis, halo=halo, with_transpose=False,
            split_width=split_width, balance=False,
        )
    return EdgePartitionedGraph(
        buckets=tuple(stacked),
        n_nodes=n,
        n_local=n_local,
        n_devices=n_devices,
        n_edges=g.n_edges,
        mesh=mesh,
        axis=axis,
        halo=halo_plan,
        segments=segments,
        shared_segments=shared,
        transpose=transpose,
    )


def _build_shared_segments(indptr, cols, val, split_width, n, n_devices):
    """Host-side: the global segment list of all super-wide rows, split
    into equal contiguous per-device shares (see :class:`SharedSegments`)."""
    deg = indptr[1:] - indptr[:-1]
    sel = np.nonzero(deg > split_width)[0]
    if sel.size == 0:
        return None
    sb = segment_rows_numpy(indptr, cols, val, sel, width=split_width,
                            n_rows_space=n, n_cols_space=n)
    S, R = sb.n_segments, sb.n_rows
    # exact equal shares — no alignment floor (the walk re-chunks at
    # runtime; padded shares on devices beyond S are all-sentinel)
    s_loc = max(1, -(-S // n_devices))
    s_tot = s_loc * n_devices

    def fit(x, fill):
        if x is None:
            return None
        x = np.asarray(x)
        if x.shape[0] >= s_tot:
            x = x[:s_tot]   # rows >= S are sentinel padding — droppable
        else:
            pad = np.full((s_tot - x.shape[0],) + x.shape[1:], fill, x.dtype)
            x = np.concatenate([x, pad])
        return x.reshape((n_devices, s_loc) + x.shape[1:])

    wide = np.asarray(sb.wide_rows)[:R].astype(np.int32)
    return SharedSegments(
        nbr=fit(sb.nbr, n),
        emask=fit(sb.emask, False),
        seg_id=fit(sb.seg_id, R),
        val=None if sb.val is None else fit(sb.val, 0.0),
        wide_rows=wide,
        # original == permuted here; remapped by the balance/reorder
        # wrapper when the partition carries a node permutation
        drop_rows=np.concatenate([wide, [n]]).astype(np.int32),
        width=int(split_width), n_rows=R, n_segments=S,
    )


def _pad_nodes(x, n_pad):
    if x is None or x.shape[0] == n_pad:
        return x
    pad = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _layout(pg: EdgePartitionedGraph):
    """The per-device arrays that ride through shard_map as one pytree."""
    ss = pg.shared_segments
    sh = None if ss is None else (ss.nbr, ss.emask, ss.seg_id, ss.val)
    return (pg.buckets, pg.segments, sh)


def _local_bg(pg: EdgePartitionedGraph, layout) -> BucketedGraph:
    """This shard's layout slice as a local BucketedGraph (shared-segment
    arrays are NOT part of it — they are walked by _shared_forward)."""
    buckets, segments, _ = layout
    local_b = jax.tree.map(lambda x: x[0], buckets)
    local_s = None if segments is None else jax.tree.map(lambda x: x[0], segments)
    return BucketedGraph(
        buckets=local_b, n_nodes=pg.n_local, n_edges=pg.n_edges,
        segments=local_s,
    )


def _shared_rep_arg(pg: EdgePartitionedGraph):
    """Replicated shared-segment row maps (wide_rows, drop_rows)."""
    ss = pg.shared_segments
    if ss is None:
        z = jnp.zeros((1,), jnp.int32)
        return (z, z)
    return (jnp.asarray(ss.wide_rows, jnp.int32),
            jnp.asarray(ss.drop_rows, jnp.int32))


def _shared_forward(pg, shared_l, rep, axis, q_l, er_l, tabs, f, score,
                    slope, drop_shared, out):
    """This shard's share of the global segment walk + the cross-device
    online-softmax combine; scatters merged wide-row outputs into this
    shard's rows (see :class:`SharedSegments`)."""
    from dfgnn_tpu.ops import bucket as _bk

    nbr, emask, seg_id, sval = (x if x is None else x[0] for x in shared_l)
    wide_rows, drop_rows = rep
    R = pg.shared_segments.n_rows
    n_local = pg.n_local
    d = jax.lax.axis_index(axis)
    idx = (wide_rows - d * n_local).astype(jnp.int32)
    valid = (idx >= 0) & (idx < n_local)
    cidx = jnp.clip(idx, 0, n_local - 1)

    def repl(x):
        # replicate the wide rows' destination-side operand: owner
        # contributes, psum broadcasts; sentinel zero row appended for
        # the padded-segment bin
        t = jnp.take(x, cidx, axis=0)
        m = valid.reshape((R,) + (1,) * (t.ndim - 1))
        t = jax.lax.psum(jnp.where(m, t, jnp.zeros_like(t)), axis)
        return jnp.concatenate(
            [t, jnp.zeros((1,) + t.shape[1:], t.dtype)], axis=0)

    qw = None if q_l is None else repl(q_l)
    erw = None if er_l is None else repl(er_l)
    row_bytes = _bk._tabs_row_bytes(tabs)
    S_loc, W = nbr.shape
    chunk = _bk._pick_chunk(S_loc, W, row_bytes)
    chunked, n_chunks, _ = _bk._chunk_args(
        (seg_id, nbr, emask, sval), S_loc, chunk,
        (R, pg.n_nodes, False, 0.0))
    fn = lambda a: _bk._segment_partials(a, qw, erw, tabs, f, score, slope,
                                         drop_shared)
    res = _bk._map_chunks(fn, chunked, n_chunks)
    m_s, l_s, acc_s = res[0], res[1], res[2]
    sid = chunked[0].reshape(-1)
    bins = R + 1
    m_loc = jax.ops.segment_max(m_s, sid, num_segments=bins,
                                indices_are_sorted=True)
    m_loc = jnp.maximum(m_loc, _bk._NEG_BIG)
    scale = jnp.exp(m_s - m_loc[sid])
    l_loc = _bk._segsum(l_s * scale, sid, bins)
    acc_loc = _bk._segsum(acc_s * scale[..., None], sid, bins)
    # cross-device online-softmax combine (the reference tiling kernel's
    # rescale algebra across devices, fused_gtconv_tiling.cu:72-86); the
    # shared max is a pure numerical shift — keep it out of autodiff
    # (pmax has no differentiation rule; all_gather of the tiny [R+1, h]
    # max array does, and the stop_gradient zeroes its cotangent)
    M = jnp.max(
        jax.lax.all_gather(jax.lax.stop_gradient(m_loc), axis), axis=0)
    resc = jnp.exp(m_loc - M)
    l_g = jax.lax.psum(l_loc * resc, axis)
    acc_g = jax.lax.psum(acc_loc * resc[..., None], axis)
    live = l_g[..., None] > 0
    out_r = jnp.where(live, acc_g / jnp.where(live, l_g[..., None], 1.0), 0.0)
    tgt = jnp.where(valid, idx, n_local)
    return out.at[tgt].set(out_r[:R].astype(out.dtype), mode="drop")


def _make_exchange(pg: EdgePartitionedGraph, send_local, axis: str):
    """Source-row exchange closure for one shard: halo-compressed
    all_to_all when the partition carries a plan, else all-gather."""
    if pg.halo is not None:
        sl = send_local[0]  # [n_devices, max_halo] local row indices
        nd, H = pg.n_devices, pg.halo.max_halo

        def exchange(x_l):
            rows = jnp.take(x_l, sl, axis=0, mode="clip")  # [nd, H, ...]
            recv = jax.lax.all_to_all(
                rows, axis, split_axis=0, concat_axis=0, tiled=True
            )
            zero = jnp.zeros((1,) + x_l.shape[1:], x_l.dtype)
            return jnp.concatenate(
                [x_l, recv.reshape((nd * H,) + x_l.shape[1:]), zero], axis=0
            )
        return exchange

    def exchange(x_l):
        return jax.lax.all_gather(x_l, axis, tiled=True)
    return exchange


def _send_arg(pg: EdgePartitionedGraph):
    if pg.halo is not None:
        return jnp.asarray(pg.halo.send_local)
    return jnp.zeros((pg.n_devices, 1), jnp.int32)


def _table_global_arg(pg: EdgePartitionedGraph):
    """Per-device table-row -> global-id map (halo layouts), else dummy."""
    if pg.halo is not None and pg.halo.table_global is not None:
        return jnp.asarray(pg.halo.table_global)
    return jnp.zeros((pg.n_devices, 1), jnp.int32)


def _perm_arg(pg: EdgePartitionedGraph):
    """Replicated permuted-global-id -> original-id map [n+1] (last entry
    = the n sentinel), or a dummy when the partition has no node perm."""
    if pg.node_perm is not None:
        return jnp.concatenate([
            jnp.asarray(pg.node_perm, jnp.int32),
            jnp.full((1,), pg.n_nodes, jnp.int32)])
    return jnp.zeros((1,), jnp.int32)


def _local_drop(pg: EdgePartitionedGraph, seed, rate: float, axis: str, tgl,
                perm=None):
    """This shard's dropout context: rows rebased to global ids by the
    contiguous row blocking; halo-remapped lane ids inverted via the
    table-global map; balance/reorder permutations inverted via the
    ``perm`` map — so the mask is bitwise the single-chip layouts' mask
    for the same (seed, edge) on ORIGINAL node ids (see
    ops.bucket._drop_ctx)."""
    if rate == 0.0:
        return None
    from dfgnn_tpu.ops.bucket import _drop_ctx

    row_base = jax.lax.axis_index(axis).astype(jnp.int32) * pg.n_local
    src_map = tgl[0] if pg.halo is not None else None
    id_perm = perm if pg.node_perm is not None else None
    return _drop_ctx(seed, rate, row_base=row_base, src_map=src_map,
                     id_perm=id_perm)


def dist_graph_attention(
    pg: EdgePartitionedGraph,
    mesh: Mesh,
    q: Optional[jax.Array],
    k: Optional[jax.Array],
    v: jax.Array,
    *,
    score: str = "dot",
    e_row: Optional[jax.Array] = None,
    e_col: Optional[jax.Array] = None,
    negative_slope: float = 0.2,
    axis: str = "data",
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jax.Array:
    """Distributed fused attention conv over a row-partitioned graph.

    Node-feature inputs/outputs are global ``[n_nodes_padded, ...]`` arrays
    sharded (or shardable) on the node dim; inside ``shard_map`` each device
    all-gathers the source-side operands and runs the local bucketed fused
    computation for its row block.

    ``dropout_rate > 0`` applies attention-weight dropout exactly as the
    single-chip paths do (N9's fused training dropout,
    ``fused_gatconv_kernel.cu:101-110``): the layout-invariant edge hash is
    keyed on global (dst, src) node ids — local row ids are rebased by the
    device's row-block offset, and halo-remapped neighbor ids are inverted
    through the plan's ``table_global`` map — so the mask is bitwise equal
    to a single-chip run with the same seed (and agrees between the
    forward and both fused-backward directions).  Partitions built with a
    node permutation (``balance``/``reorder``) carry the inverse map, so
    the hash keys on ORIGINAL node ids there too — bitwise parity with a
    single-chip run holds for every partition flavor.
    """
    rate = float(dropout_rate)
    if rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")
    if (rate > 0.0 and pg.halo is not None
            and pg.halo.table_global is None):
        # a halo plan without the inverse map would silently hash every
        # lane to id 0 (correlated whole-row drops) — refuse instead
        raise ValueError(
            "dropout on a halo-compressed partition requires the plan's "
            "table_global map; rebuild with partition_graph(...) from this "
            "version (HaloExchange.table_global is None)")
    from dfgnn_tpu.ops.edge_dropout import seed_from_key

    seed = (seed_from_key(dropout_rng) if rate > 0.0
            else jnp.zeros((), jnp.uint32))
    if pg.node_perm is not None:
        ptake = lambda x: None if x is None else jnp.take(x, pg.node_perm, axis=0)
        q, k, v = ptake(q), ptake(k), ptake(v)
        e_row, e_col = ptake(e_row), ptake(e_col)
    n_pad = pg.n_local * pg.n_devices
    q, k, v = (_pad_nodes(t, n_pad) for t in (q, k, v))
    e_row = _pad_nodes(e_row, n_pad)
    e_col = _pad_nodes(e_col, n_pad)

    node_spec = P(axis)
    bucket_spec = jax.tree.map(lambda _: P(axis), _layout(pg))

    if score == "dot":
        operands = (q, k, v)
    else:
        operands = (e_row, e_col, v)
    specs = tuple(node_spec for _ in operands)

    if pg.transpose is not None:
        if pg.mesh is not mesh:
            # the explicitly passed mesh wins (the fused path reads pg.mesh)
            pg = pg.replace(mesh=mesh, transpose=pg.transpose.replace(mesh=mesh))
        a, b_ = operands[0], operands[1]
        out = _dist_fused((score, negative_slope, axis, rate), pg, seed,
                          a, b_, operands[2])
        out = out[: pg.n_nodes]
        if pg.node_rank is not None:
            out = jnp.take(out, pg.node_rank, axis=0)
        return out

    def body(layout, send_local, tgl, perm_, rep, seed_, *ops):
        from dfgnn_tpu.ops import bucket as _bk

        bg = _local_bg(pg, layout)
        exchange = _make_exchange(pg, send_local, axis)
        drop = _local_drop(pg, seed_, rate, axis, tgl, perm_)
        if score == "dot":
            q_l, k_l, v_l = ops
            er_l = None
            tabs = _bk._make_tabs(exchange(k_l), exchange(v_l), None,
                                  "dot", None)
        else:
            er_l, ec_l, v_l = ops
            q_l = None
            tabs = _bk._make_tabs(None, exchange(v_l), exchange(ec_l),
                                  "add", None)
        out, _ = _bk._forward_tabs(
            bg, q_l, er_l, tabs, v_l.dtype, v_l.shape[2], score,
            negative_slope, 2048, drop=drop)
        if pg.shared_segments is not None:
            drop_sh = None
            if rate > 0.0:
                drop_sh = _bk._drop_ctx(
                    seed_, rate,
                    id_perm=(perm_ if pg.node_perm is not None else None),
                    row_map=rep[1])
            out = _shared_forward(
                pg, layout[2], rep, axis, q_l, er_l, tabs, v_l.shape[2],
                score, negative_slope, drop_sh, out)
        return out

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(bucket_spec, P(axis), P(axis), P(), P(), P()) + specs,
        out_specs=node_spec,
        check_vma=False,
    )
    out = fn(_layout(pg), _send_arg(pg), _table_global_arg(pg), _perm_arg(pg),
             _shared_rep_arg(pg), seed, *operands)
    out = out[: pg.n_nodes]
    if pg.node_rank is not None:
        out = jnp.take(out, pg.node_rank, axis=0)
    return out


# ---------------------------------------------------------------------------
# Fused distributed custom backward (partition_graph(with_transpose=True)):
# the multi-chip version of the bucket path's two-direction backward.  The
# CSR-direction pass (dQ / d e_row) runs on the destination partition with
# the same source exchange as forward; the CSC-direction pass (dK / d e_col
# and dV) runs on the SOURCE partition (the transposed layout, same node
# blocks) with the reverse exchange carrying q/do/lse/delta.  Both are
# gather-based; no scatter-adds and no psum_scatter transposes.
# ---------------------------------------------------------------------------

def _dist_forward_lse(meta, pg, seed, a, b_, v):
    """shard_map forward emitting (out, lse), both node-sharded."""
    from dfgnn_tpu.ops import bucket as _bk

    score, slope, axis, rate = meta
    node_spec = P(axis)
    bucket_spec = jax.tree.map(lambda _: P(axis), _layout(pg))

    def body(layout, send_local, tgl, perm_, seed_, a_l, b_l, v_l):
        bg = _local_bg(pg, layout)
        exchange = _make_exchange(pg, send_local, axis)
        drop = _local_drop(pg, seed_, rate, axis, tgl, perm_)
        if score == "dot":
            return _bk._forward(bg, a_l, exchange(b_l), exchange(v_l),
                                score, None, None, slope, 2048, None,
                                drop=drop)
        return _bk._forward(bg, None, None, exchange(v_l),
                            score, a_l, exchange(b_l), slope, 2048, None,
                            drop=drop)

    fn = jax.shard_map(
        body, mesh=pg.mesh,
        in_specs=(bucket_spec, node_spec, node_spec, P(), P(),
                  node_spec, node_spec, node_spec),
        out_specs=(node_spec, node_spec),
        check_vma=False,
    )
    return fn(_layout(pg), _send_arg(pg), _table_global_arg(pg),
              _perm_arg(pg), seed, a, b_, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dist_fused(meta, pg, seed, a, b_, v):
    out, _ = _dist_forward_lse(meta, pg, seed, a, b_, v)
    return out


def _dist_fused_fwd(meta, pg, seed, a, b_, v):
    out, lse = _dist_forward_lse(meta, pg, seed, a, b_, v)
    return out, (pg, seed, a, b_, v, out, lse)


def _dist_fused_bwd(meta, res, do):
    from dfgnn_tpu.ops import bucket as _bk

    score, slope, axis, rate = meta
    pg, seed, a, b_, v, out, lse = res
    pgT = pg.transpose
    h, f = v.shape[1], v.shape[2]
    node_spec = P(axis)
    bucket_spec = jax.tree.map(lambda _: P(axis), _layout(pg))
    bucketT_spec = jax.tree.map(lambda _: P(axis), _layout(pgT))

    def body(layout, layoutT, send_local, send_localT, tgl, tglT, perm_,
             seed_, a_l, b_l, v_l, do_l, out_l, lse_l):
        bg = _local_bg(pg, layout)
        bgT = _local_bg(pgT, layoutT)
        exchange = _make_exchange(pg, send_local, axis)
        exchangeT = _make_exchange(pgT, send_localT, axis)
        # pg and its transpose share one node permutation (same blocks)
        drop = _local_drop(pg, seed_, rate, axis, tgl, perm_)
        dropT = _local_drop(pgT, seed_, rate, axis, tglT, perm_)
        do32 = do_l.astype(jnp.float32)
        delta_l = jnp.einsum("nhf,nhf->nh", do32, out_l.astype(jnp.float32))

        # CSR direction (destination partition): dQ / d e_row
        if score == "dot":
            tabs = _bk._make_tabs(exchange(b_l), exchange(v_l), None, score, None)
        else:
            tabs = _bk._make_tabs(None, exchange(v_l), exchange(b_l), score, None)
        csr_fn = lambda args: _bk._bwd_csr_chunk(
            args, a_l, do32, lse_l, delta_l, tabs, f, score, slope,
            drop=drop)
        csr_shapes = [(h, f)] if score == "dot" else [(h,)]
        csr_bytes = _bk._tabs_row_bytes(tabs) + (
            _bk._tabs_row_bytes(tabs[:1]) if score == "dot" else 0)
        (da_l,) = _bk._walk_backward(bg, csr_fn, csr_shapes, csr_bytes)

        # CSC direction (source partition): dK / d e_col, dV — the remote
        # operands (q/do of destinations and the packed (lse, delta)
        # scalars) ride the reverse exchange as separate tables so each
        # contraction keeps its own fused gather (see ops.bucket._take_src).
        ld_l = jnp.stack([lse_l, delta_l], axis=-1)      # [n_l, h, 2]
        tabsT = (exchangeT(a_l), exchangeT(do32), exchangeT(ld_l))
        csc_fn = lambda args: _bk._bwd_csc_chunk(
            args, b_l, v_l, tabsT, f, score, slope, drop=dropT)
        csc_shapes = [(h, f), (h, f)] if score == "dot" else [(h,), (h, f)]
        csc_bytes = (2 * _bk._tabs_row_bytes(tabsT[1:2])
                     + _bk._tabs_row_bytes(tabsT[2:])
                     + (2 if score == "dot" else 1)
                     * _bk._tabs_row_bytes(tabsT[:1]))
        db_l, dv_l = _bk._walk_backward(bgT, csc_fn, csc_shapes, csc_bytes)
        return da_l, db_l, dv_l

    fn = jax.shard_map(
        body, mesh=pg.mesh,
        in_specs=(bucket_spec, bucketT_spec, node_spec, node_spec,
                  node_spec, node_spec, P(), P()) + (node_spec,) * 6,
        out_specs=(node_spec, node_spec, node_spec),
        check_vma=False,
    )
    da, db, dv = fn(_layout(pg), _layout(pgT), _send_arg(pg), _send_arg(pgT),
                    _table_global_arg(pg), _table_global_arg(pgT),
                    _perm_arg(pg), seed, a, b_, v, do, out, lse)
    from dfgnn_tpu.ops.bucket import _float0_like

    return (_zero_tangents_pg(pg), _float0_like(seed), da.astype(a.dtype),
            db.astype(b_.dtype), dv.astype(v.dtype))


def _zero_tangents_pg(pg):
    from dfgnn_tpu.ops.bucket import _zero_tangents

    return _zero_tangents(pg)


_dist_fused.defvjp(_dist_fused_fwd, _dist_fused_bwd)
