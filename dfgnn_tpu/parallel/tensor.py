"""Tensor (model) parallelism: head-sharded attention.

SURVEY.md §2.3 marks TP optional (no reference counterpart — DF-GNN is
single-GPU); the natural TP decomposition for multi-head graph attention is
by HEADS: every head's SDDMM -> softmax -> SpMM is independent, so sharding
the head dim over a "model" mesh axis runs the whole conv with zero
cross-shard communication — the only TP collectives are the ones GSPMD
inserts around the q/k/v/out projections (whose weights shard on the
output-feature dim).

Composes with data parallelism (2-D mesh ("data", "model")) and with any
graph layout: the layout pytree is replicated across the model axis, node
features shard on the head dim.
"""

from __future__ import annotations

from typing import Optional

import jax

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dfgnn_tpu.graph import DenseBatch
from dfgnn_tpu.ops import graph_attention


def make_tp_mesh(n_data: int, n_model: int,
                 axis_names=("data", "model")) -> Mesh:
    import numpy as np

    devs = np.asarray(jax.devices()[: n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(devs, axis_names)


def head_sharded_attention(
    mesh: Mesh,
    g,
    q: Optional[jax.Array],
    k: Optional[jax.Array],
    v: jax.Array,
    *,
    axis: str = "model",
    **kw,
):
    """Run :func:`dfgnn_tpu.ops.graph_attention` with the head dim sharded
    over ``axis``.  Heads must divide the axis size; every shard computes
    its head slice with the normal single-device fused path (flash /
    bucket / oracle by layout), no collectives inside."""
    n_model = mesh.shape[axis]
    h = v.shape[-2]
    if h % n_model:
        raise ValueError(f"heads={h} not divisible by model axis {n_model}")
    # head dim: [B, P, h, f] for DenseBatch layouts, [n, h, f] otherwise
    hs = (P(None, None, axis, None) if isinstance(g, DenseBatch)
          else P(None, axis, None))
    layout_spec = jax.tree.map(lambda _: P(), g)

    def body(g_l, q_l, k_l, v_l):
        return graph_attention(g_l, q_l, k_l, v_l, **kw)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(layout_spec, hs, hs, hs),
        out_specs=hs,
        check_vma=False,
    )
    return fn(g, q, k, v)


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """Shard projection weights on their OUTPUT-feature dim over the model
    axis (Megatron-style column parallelism for q/k/v; GSPMD inserts the
    matching collectives), replicating everything else."""
    def put(path, x):
        name = "/".join(str(p) for p in path)
        if x.ndim == 2 and ("q_proj" in name or "k_proj" in name
                            or "v_proj" in name or "W" in name):
            return jax.device_put(x, NamedSharding(mesh, P(None, axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(put, params)
