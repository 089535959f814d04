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
    permuted on entry and outputs returned in original order."""
    n = g.n_nodes
    if reorder:
        from dfgnn_tpu.parallel.reorder import (
            bfs_reorder, lpa_reorder, reorder_graph,
        )

        if reorder not in ("bfs", "lpa"):
            raise ValueError(f"unknown reorder {reorder!r}")
        e = g.n_edges
        rows_np = np.asarray(g.rows)[:e]
        cols_np = np.asarray(g.cols)[:e]
        fn = lpa_reorder if reorder == "lpa" else bfs_reorder
        perm = fn(rows_np, cols_np, n)
        nr, nc, rank = reorder_graph(rows_np, cols_np, n, perm)
        g2 = Graph.from_coo(
            nr, nc, n, val=None if g.val is None else np.asarray(g.val)[:e])
        pg = partition_graph(
            g2, n_devices, min_width=min_width, widths=widths, mesh=mesh,
            axis=axis, halo=halo, with_transpose=with_transpose,
            split_width=split_width, reorder=None)
        return pg.replace(node_perm=perm.astype(np.int32),
                          node_rank=rank.astype(np.int32))
    n_local = _round_up(n, n_devices) // n_devices
    indptr = np.asarray(g.indptr, dtype=np.int64)
    cols = np.asarray(g.cols)
    val = None if g.val is None else np.asarray(g.val)

    # widths shared across devices; rows wider than split_width go to the
    # fixed-width segment layout (harmonized below)
    deg = indptr[1:] - indptr[:-1]
    max_deg = int(deg.max()) if n else 0
    use_segments = widths is None and max_deg > split_width
    if widths is None:
        widths = _width_ladder(
            min_width, min(max_deg, split_width) if use_segments else max_deg,
            cap=use_segments,
        )

    # first pass: per-device bucket row counts -> harmonized r_pad
    per_dev = []
    for d in range(n_devices):
        lo_r, hi_r = d * n_local, min((d + 1) * n_local, n)
        ip = indptr[lo_r : hi_r + 1] - indptr[lo_r]
        if hi_r < (d + 1) * n_local:  # pad rows with degree 0
            ip = np.concatenate([ip, np.full((d + 1) * n_local - hi_r, ip[-1])])
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
            chunk = max(8, min((1 << 15) // w, _round_up(mx, 8)))
            row_pad_to[w] = _round_up(mx, chunk)

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
    if use_segments:
        # harmonize segment/row pads across devices, then stack
        chunk = max(8, (1 << 15) // split_width)
        sels, S_max, R_max = [], 0, 0
        for ip, _, _ in per_dev:
            dg = ip[1:] - ip[:-1]
            sel = np.nonzero(dg > split_width)[0]
            sels.append(sel)
            R_max = max(R_max, sel.size)
            S_max = max(S_max, int((-(-dg[sel] // split_width)).sum()))
        if R_max:
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
        transpose = partition_graph(
            gT, n_devices, min_width=min_width, widths=None,
            mesh=mesh, axis=axis, halo=halo, with_transpose=False,
            split_width=split_width,
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
        transpose=transpose,
    )


def _pad_nodes(x, n_pad):
    if x is None or x.shape[0] == n_pad:
        return x
    pad = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _layout(pg: EdgePartitionedGraph):
    """The per-device arrays that ride through shard_map as one pytree."""
    return (pg.buckets, pg.segments)


def _local_bg(pg: EdgePartitionedGraph, layout) -> BucketedGraph:
    """This shard's layout slice as a local BucketedGraph."""
    buckets, segments = layout
    local_b = jax.tree.map(lambda x: x[0], buckets)
    local_s = None if segments is None else jax.tree.map(lambda x: x[0], segments)
    return BucketedGraph(
        buckets=local_b, n_nodes=pg.n_local, n_edges=pg.n_edges,
        segments=local_s,
    )


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


def _local_drop(pg: EdgePartitionedGraph, seed, rate: float, axis: str, tgl):
    """This shard's dropout context: rows rebased to global ids by the
    contiguous row blocking; halo-remapped lane ids inverted via the
    table-global map, so the mask equals the single-chip layouts' mask
    for the same (seed, edge) (see ops.bucket._drop_ctx)."""
    if rate == 0.0:
        return None
    from dfgnn_tpu.ops.bucket import _drop_ctx

    row_base = jax.lax.axis_index(axis).astype(jnp.int32) * pg.n_local
    src_map = tgl[0] if pg.halo is not None else None
    return _drop_ctx(seed, rate, row_base=row_base, src_map=src_map)


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
    forward and both fused-backward directions).  Caveat: with
    ``partition_graph(..., reorder="bfs"/"lpa")`` the hash keys on the
    PERMUTED node ids, so the mask is a valid dropout draw but not
    bitwise equal to a single-chip run on the original ids.
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

    def body(layout, send_local, tgl, seed_, *ops):
        from dfgnn_tpu.ops import bucket as _bk

        bg = _local_bg(pg, layout)
        exchange = _make_exchange(pg, send_local, axis)
        drop = _local_drop(pg, seed_, rate, axis, tgl)
        if score == "dot":
            q_l, k_l, v_l = ops
            out, _ = _bk._any_forward(
                bg, q_l, exchange(k_l), exchange(v_l), "dot", None, None,
                negative_slope, 2048, None, drop=drop)
            return out
        er_l, ec_l, v_l = ops
        out, _ = _bk._any_forward(
            bg, None, None, exchange(v_l), "add", er_l, exchange(ec_l),
            negative_slope, 2048, None, drop=drop)
        return out

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(bucket_spec, P(axis), P(axis), P()) + specs,
        out_specs=node_spec,
        check_vma=False,
    )
    out = fn(_layout(pg), _send_arg(pg), _table_global_arg(pg), seed,
             *operands)
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

    def body(layout, send_local, tgl, seed_, a_l, b_l, v_l):
        bg = _local_bg(pg, layout)
        exchange = _make_exchange(pg, send_local, axis)
        drop = _local_drop(pg, seed_, rate, axis, tgl)
        if score == "dot":
            return _bk._forward(bg, a_l, exchange(b_l), exchange(v_l),
                                score, None, None, slope, 2048, None,
                                drop=drop)
        return _bk._forward(bg, None, None, exchange(v_l),
                            score, a_l, exchange(b_l), slope, 2048, None,
                            drop=drop)

    fn = jax.shard_map(
        body, mesh=pg.mesh,
        in_specs=(bucket_spec, node_spec, node_spec, P(),
                  node_spec, node_spec, node_spec),
        out_specs=(node_spec, node_spec),
        check_vma=False,
    )
    return fn(_layout(pg), _send_arg(pg), _table_global_arg(pg), seed,
              a, b_, v)


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

    def body(layout, layoutT, send_local, send_localT, tgl, tglT, seed_,
             a_l, b_l, v_l, do_l, out_l, lse_l):
        bg = _local_bg(pg, layout)
        bgT = _local_bg(pgT, layoutT)
        exchange = _make_exchange(pg, send_local, axis)
        exchangeT = _make_exchange(pgT, send_localT, axis)
        drop = _local_drop(pg, seed_, rate, axis, tgl)
        dropT = _local_drop(pgT, seed_, rate, axis, tglT)
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
                  node_spec, node_spec, P()) + (node_spec,) * 6,
        out_specs=(node_spec, node_spec, node_spec),
        check_vma=False,
    )
    da, db, dv = fn(_layout(pg), _layout(pgT), _send_arg(pg), _send_arg(pgT),
                    _table_global_arg(pg), _table_global_arg(pgT), seed,
                    a, b_, v, do, out, lse)
    from dfgnn_tpu.ops.bucket import _float0_like

    return (_zero_tangents_pg(pg), _float0_like(seed), da.astype(a.dtype),
            db.astype(b_.dtype), dv.astype(v.dtype))


def _zero_tangents_pg(pg):
    from dfgnn_tpu.ops.bucket import _zero_tangents

    return _zero_tangents(pg)


_dist_fused.defvjp(_dist_fused_fwd, _dist_fused_bwd)
