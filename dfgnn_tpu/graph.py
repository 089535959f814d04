"""Graph containers — immutable, static-shape pytrees.

TPU-first design notes
----------------------
The reference keeps a DGL graph object and converts it per-strategy into CUDA
tensor bundles (``DFGNN/layers/util.py:52-206``: ``preprocess_CSR`` /
``preprocess_Hyper`` / ...).  On TPU everything under ``jit`` must have static
shapes, so the containers here are *padded*: edge arrays are padded to a bucket
size with a sentinel row/col index of ``n_nodes`` (one extra segment that is
dropped after segment reductions), and node arrays may carry a ``node_mask``.

Semantics (matching the reference's ``forward_dglsp`` oracle,
``DFGNN/layers/GT/gtconv_layer.py:30-33``): an edge ``e`` connects
``rows[e] -> cols[e]``; edge-softmax normalises over all edges sharing a
**row**, and aggregation writes to the **row** node:

    out[r] = sum_{e: rows[e]=r} softmax_e(score_e) * v[cols[e]]

Edges are stored sorted by ``rows`` (CSR order).  ``indptr`` is the CSR row
pointer.  The sorted-COO ``rows`` array is the analog of the reference's
"hyper" format rows array (``DFGNN/layers/util.py:82-100``), kept because
segment reductions want it; CSR ``indptr`` is kept for row-block kernels.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def device_put(tree, sharding=None):
    """Move a host-constructed container's arrays onto device(s) once.

    Containers are built with numpy leaves so host-side preprocessing never
    reads back from the accelerator (device->host readback is catastrophic
    over remote-attached TPUs).  Call this once before entering the compute
    loop; jit would otherwise re-transfer on every call.
    """
    def put(x):
        if sharding is not None:
            return jax.device_put(x, sharding)
        return jnp.asarray(x)

    return jax.tree.map(put, tree)


@struct.dataclass
class Graph:
    """A (possibly block-diagonal-batched) sparse graph in padded CSR+COO form.

    Array fields are jax arrays (leaves); ``n_nodes``/``n_edges``/``n_graphs``
    are static python ints (aux data) so shapes stay compile-time constant.

    Padded edges use sentinel ``rows == cols == n_nodes``; padded nodes (when
    the node set itself is padded, e.g. batched graphs) are marked False in
    ``node_mask`` and must have no real edges.
    """

    indptr: jax.Array          # [n_nodes + 1] int32 CSR row pointer (real edges)
    rows: jax.Array            # [e_pad] int32, sorted ascending, pad = n_nodes
    cols: jax.Array            # [e_pad] int32, pad = n_nodes
    val: Optional[jax.Array] = None      # [e_pad] edge values (ref: A.val)
    node_mask: Optional[jax.Array] = None   # [n_nodes] bool, None = all real
    graph_id: Optional[jax.Array] = None    # [n_nodes] int32 batch membership
    n_nodes: int = struct.field(pytree_node=False, default=0)
    n_edges: int = struct.field(pytree_node=False, default=0)  # real edges
    n_graphs: int = struct.field(pytree_node=False, default=1)

    @property
    def e_pad(self) -> int:
        return self.rows.shape[0]

    @property
    def edge_mask(self) -> jax.Array:
        """[e_pad] bool — True for real edges."""
        return self.rows < self.n_nodes

    @property
    def degrees(self) -> jax.Array:
        return self.indptr[1:] - self.indptr[:-1]

    # ------------------------------------------------------------------
    # Construction (host-side, numpy)
    # ------------------------------------------------------------------
    @staticmethod
    def from_coo(
        rows,
        cols,
        n_nodes: int,
        val=None,
        *,
        edge_pad_multiple: int = 128,
        n_graphs: int = 1,
        graph_id=None,
        node_mask=None,
        sort: bool = True,
    ) -> "Graph":
        """Build a padded Graph from COO edge lists (host-side).

        Mirrors the role of ``g_to_SPmatrix`` + ``preprocess_Hyper``
        (``DFGNN/layers/util.py:52-100``) but produces padded static-shape
        arrays instead of a ``smem_consume`` budget.
        """
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        assert rows.shape == cols.shape and rows.ndim == 1
        n_edges = int(rows.shape[0])
        if val is not None:
            val = np.asarray(val, dtype=np.float32)

        if sort and n_edges > 0:
            from dfgnn_tpu import native

            indptr, cols, perm = native.csr_from_coo(rows, cols, n_nodes)
            rows = np.repeat(
                np.arange(n_nodes, dtype=np.int64), np.diff(indptr)
            )
            if val is not None:
                val = val[perm]
        else:
            indptr = np.zeros(n_nodes + 1, dtype=np.int64)
            if n_edges > 0:
                np.add.at(indptr, rows + 1, 1)
            indptr = np.cumsum(indptr)

        e_pad = max(_round_up(max(n_edges, 1), edge_pad_multiple), edge_pad_multiple)
        rows_p = np.full(e_pad, n_nodes, dtype=np.int32)
        cols_p = np.full(e_pad, n_nodes, dtype=np.int32)
        rows_p[:n_edges] = rows
        cols_p[:n_edges] = cols
        val_p = None
        if val is not None:
            val_p = np.zeros(e_pad, dtype=np.float32)
            val_p[:n_edges] = val

        return Graph(
            indptr=indptr.astype(np.int32),
            rows=rows_p,
            cols=cols_p,
            val=val_p,
            node_mask=None if node_mask is None else np.asarray(node_mask),
            graph_id=None if graph_id is None else np.asarray(graph_id, dtype=np.int32),
            n_nodes=int(n_nodes),
            n_edges=n_edges,
            n_graphs=int(n_graphs),
        )

    def to_csc(self) -> "CSCAux":
        """Transpose auxiliary structure (host-side) for column-direction
        passes — analog of the reference's CSC + ``val_idx`` edge permutation
        used by the fused backward (``DFGNN/layers/util.py:116-142``)."""
        rows = np.asarray(self.rows)[: self.n_edges]
        cols = np.asarray(self.cols)[: self.n_edges]
        order = np.argsort(cols, kind="stable")
        col_ptr = np.zeros(self.n_nodes + 1, dtype=np.int64)
        np.add.at(col_ptr, cols + 1, 1)
        col_ptr = np.cumsum(col_ptr)
        e_pad = self.e_pad
        perm = np.full(e_pad, e_pad - 1, dtype=np.int32)
        perm[: self.n_edges] = order
        rows_csc = np.full(e_pad, self.n_nodes, dtype=np.int32)
        rows_csc[: self.n_edges] = rows[order]
        cols_csc = np.full(e_pad, self.n_nodes, dtype=np.int32)
        cols_csc[: self.n_edges] = cols[order]
        return CSCAux(
            col_ptr=col_ptr.astype(np.int32),
            rows=rows_csc,
            cols=cols_csc,
            edge_perm=perm,
        )

    def device_put(self, sharding=None) -> "Graph":
        return device_put(self, sharding)


@struct.dataclass
class CSCAux:
    """Column-direction (transposed) view of a Graph's edges."""

    col_ptr: jax.Array   # [n_nodes + 1] int32
    rows: jax.Array      # [e_pad] int32, source node per csc-ordered edge
    cols: jax.Array      # [e_pad] int32, sorted ascending
    edge_perm: jax.Array  # [e_pad] int32, csc edge -> csr edge id


@struct.dataclass
class DenseBatch:
    """Batch of small graphs as dense per-graph adjacency masks.

    The TPU-native replacement for the reference's "hyper" CSR+COO batched
    format (``DFGNN/src/fused_gtconv/fused_gtconv_hyper.cu``): graphs with
    ~100 nodes are padded to ``np_pad`` nodes and attention runs as dense
    masked flash-attention on the MXU.  At the reference's batched workloads
    (PATTERN ~119 nodes / MNIST 70 / CIFAR10 117, degree ~8-50,
    ``figure/graph_statistics/graph_statistics.md``) dense masked attention
    both reads fewer HBM bytes than gather-based sparse and keeps the FLOPs
    on the systolic array.

    Node ordering: graph b's node i is flat node ``b * np_pad + i``, so a
    flattened ``[B * np_pad, ...]`` feature tensor lines up with an
    equivalent block-diagonal :class:`Graph` for cross-checking.
    """

    adj: jax.Array        # [B, np_pad, np_pad] bool; adj[b, r, c] = edge r->c
    node_mask: jax.Array  # [B, np_pad] bool
    val: Optional[jax.Array] = None  # [B, np_pad, np_pad] edge values
    n_graphs: int = struct.field(pytree_node=False, default=0)
    np_pad: int = struct.field(pytree_node=False, default=0)
    n_edges: int = struct.field(pytree_node=False, default=0)
    n_nodes: int = struct.field(pytree_node=False, default=0)  # real nodes

    @staticmethod
    def from_graph_list(graphs, np_pad: Optional[int] = None) -> "DenseBatch":
        """Collate a list of (rows, cols, n_nodes) tuples (host-side)."""
        max_n = max(g[2] for g in graphs)
        if np_pad is None:
            np_pad = max(_round_up(max_n, 128), 128)
        assert max_n <= np_pad
        B = len(graphs)
        adj = np.zeros((B, np_pad, np_pad), dtype=bool)
        mask = np.zeros((B, np_pad), dtype=bool)
        from dfgnn_tpu import native

        offs = np.zeros(B + 1, dtype=np.int64)
        for b, (r, c, n) in enumerate(graphs):
            offs[b + 1] = offs[b] + len(r)
            mask[b, :n] = True
        all_r = np.concatenate([np.asarray(g[0], dtype=np.int64) for g in graphs])
        all_c = np.concatenate([np.asarray(g[1], dtype=np.int64) for g in graphs])
        if not native.fill_dense_adj(offs, all_r, all_c, adj):
            for b, (rows, cols, n) in enumerate(graphs):
                adj[b, np.asarray(rows), np.asarray(cols)] = True
        n_edges = int(adj.sum())
        n_nodes = int(mask.sum())
        return DenseBatch(
            adj=adj,
            node_mask=mask,
            n_graphs=B,
            np_pad=int(np_pad),
            n_edges=n_edges,
            n_nodes=n_nodes,
        )

    def device_put(self, sharding=None) -> "DenseBatch":
        return device_put(self, sharding)

    def to_graph(self) -> Graph:
        """Equivalent flattened block-diagonal edge-format Graph (host-side),
        for cross-checking dense vs sparse paths."""
        adj = np.asarray(self.adj)
        B, P, _ = adj.shape
        b, r, c = np.nonzero(adj)
        rows = b * P + r
        cols = b * P + c
        graph_id = np.repeat(np.arange(B, dtype=np.int32), P)
        return Graph.from_coo(
            rows,
            cols,
            n_nodes=B * P,
            n_graphs=B,
            graph_id=graph_id,
            node_mask=np.asarray(self.node_mask).reshape(-1),
        )
