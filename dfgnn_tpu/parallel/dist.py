"""Multi-chip distribution: mesh construction + sharding of graph batches.

New scope relative to the reference (which is single-GPU, SURVEY.md section
2.3): scaling is by `jax.sharding` over a device mesh, letting GSPMD insert
ICI collectives.

Two regimes:
* **Batched graphs (data parallel)** — shard the graph dimension of a
  :class:`DenseBatch` (and the matching features/labels) across the mesh;
  parameters replicated; gradient all-reduce inserted by GSPMD.
* **One large graph (edge partition)** — destination-row partitioning with
  source-feature gather, in :mod:`dfgnn_tpu.parallel.partition`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dfgnn_tpu.graph import DenseBatch


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_dense_batch(batch: DenseBatch, mesh: Mesh, axis: str = "data") -> DenseBatch:
    """Place a DenseBatch with its graph dimension sharded over ``axis``.

    ``n_graphs`` must divide by the mesh size.
    """
    n = mesh.shape[axis]
    assert batch.n_graphs % n == 0, (batch.n_graphs, n)
    sh = NamedSharding(mesh, P(axis))
    return DenseBatch(
        adj=jax.device_put(batch.adj, sh),
        node_mask=jax.device_put(batch.node_mask, sh),
        val=None if batch.val is None else jax.device_put(batch.val, sh),
        n_graphs=batch.n_graphs,
        np_pad=batch.np_pad,
        n_edges=batch.n_edges,
        n_nodes=batch.n_nodes,
    )


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for arrays whose leading dim is the graph/batch dim."""
    return NamedSharding(mesh, P(axis))
