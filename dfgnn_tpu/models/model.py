"""Model assembly: input projections, pooling, full models.

Mirrors the reference's model layer: ``choose_Inproj`` / ``Model``
(``DFGNN/layers/model.py:6-40``), the 8-layer graph-level ``GTModel``
(``script/train/train_gtconv.py:51-77``), the full-graph ``Net``
(``script/train/train_full_graph_timing.py:14-35``) and the multi-layer GAT
training net (``script/train/train_gatconv.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dfgnn_tpu.graph import DenseBatch, Graph
from dfgnn_tpu.formats import BlockedBucketedGraph, BucketedGraph
from dfgnn_tpu.models.conv import GTConv, GATConv, make_conv

# ogb full_atom_feature_dims — vocab sizes of the 9 categorical atom features
# (role of ogb's AtomEncoder used for mol/peptides datasets, model.py:6-14).
_ATOM_FEATURE_DIMS = (119, 5, 12, 12, 10, 6, 6, 2, 2)


class AtomEncoder(nn.Module):
    """Sum of per-feature embeddings over the ogb atom-feature columns."""

    hidden_size: int

    @nn.compact
    def __call__(self, x):  # x: [n, 9] int
        out = 0
        for i, vocab in enumerate(_ATOM_FEATURE_DIMS):
            # clip, don't fill: out-of-range ids hit jnp.take's NaN fill
            # inside nn.Embed and silently poison the whole forward
            idx = jnp.clip(x[..., i], 0, vocab - 1)
            out = out + nn.Embed(vocab, self.hidden_size, name=f"atom_{i}")(idx)
        return out


def choose_inproj(dataset_name: str, hidden_size: int) -> nn.Module:
    """Dataset-specific input projection (parity: ``choose_Inproj``,
    ``DFGNN/layers/model.py:6-25``)."""
    if dataset_name in ("ogbg-molhiv", "ogbg-molpcba", "Peptides-func", "Peptides-struct"):
        return AtomEncoder(hidden_size)
    if dataset_name == "PATTERN":
        return nn.Embed(3, hidden_size)
    if dataset_name == "CLUSTER":
        return nn.Embed(7, hidden_size)
    if dataset_name == "MNIST":
        return nn.Dense(hidden_size)
    if dataset_name == "CIFAR10":
        return nn.Dense(hidden_size)
    if dataset_name in ("PascalVOC-SP", "COCO-SP"):
        return nn.Dense(hidden_size)
    if dataset_name in ("digits", "digits-func"):
        return nn.Dense(hidden_size)
    raise ValueError(f"unknown dataset {dataset_name}")


def graph_pool(g, x: jax.Array, op: str = "sum") -> jax.Array:
    """Per-graph pooling of node-flat features (ref: ``dglnn.SumPooling``).

    Returns ``[n_graphs, d]``.  Padded nodes contribute zero.
    """
    if isinstance(g, DenseBatch):
        xb = x.reshape(g.n_graphs, g.np_pad, -1)
        mask = g.node_mask[..., None]
        s = jnp.sum(jnp.where(mask, xb, 0.0), axis=1)
        if op == "sum":
            return s
        if op == "mean":
            cnt = jnp.maximum(jnp.sum(g.node_mask, axis=1, keepdims=True), 1)
            return s / cnt
        raise ValueError(op)
    if isinstance(g, (Graph, BucketedGraph, BlockedBucketedGraph)):
        if g.graph_id is None:
            s = jnp.sum(x, axis=0, keepdims=True)
            return s if op == "sum" else s / x.shape[0]
        xm = x if getattr(g, "node_mask", None) is None else jnp.where(
            g.node_mask[:, None], x, 0.0
        )
        s = jax.ops.segment_sum(xm, g.graph_id, num_segments=g.n_graphs)
        if op == "sum":
            return s
        cnt = jax.ops.segment_sum(
            jnp.ones((x.shape[0], 1)) if getattr(g, "node_mask", None) is None
            else g.node_mask[:, None].astype(x.dtype),
            g.graph_id,
            num_segments=g.n_graphs,
        )
        return s / jnp.maximum(cnt, 1)
    raise TypeError(type(g))


class Model(nn.Module):
    """inproj -> single conv (parity: ``Model``, ``layers/model.py:29-40``)."""

    dataset_name: str
    conv: str
    hidden_size: int
    num_heads: int = 1
    method: str = "auto"

    @nn.compact
    def __call__(self, g, x, impl: Optional[str] = None):
        h = choose_inproj(self.dataset_name, self.hidden_size)(x)
        return make_conv(self.conv, self.hidden_size, self.num_heads, method=self.method)(
            g, h, impl=impl
        )


class GTModel(nn.Module):
    """Graph-level model: inproj -> num_layers x GTConv -> sum-pool -> head
    (parity: ``GTModel``, ``script/train/train_gtconv.py:51-77``)."""

    dataset_name: str
    out_size: int
    hidden_size: int = 64
    num_layers: int = 8
    num_heads: int = 1
    method: str = "auto"

    @nn.compact
    def __call__(self, g, x, impl: Optional[str] = None):
        h = choose_inproj(self.dataset_name, self.hidden_size)(x)
        for i in range(self.num_layers):
            h = GTConv(self.hidden_size, self.num_heads, method=self.method, name=f"layer_{i}")(
                g, h, impl=impl
            )
        pooled = graph_pool(g, h, "sum")
        return nn.Dense(self.out_size, name="predictor")(pooled)


class FullGraphNet(nn.Module):
    """Node-level model: in_proj -> num_layers x conv -> out_proj ->
    log_softmax (parity: ``Net``, ``train_full_graph_timing.py:14-35``)."""

    conv: str
    num_classes: int
    hidden_size: int = 64
    num_layers: int = 8
    num_heads: int = 1
    method: str = "auto"
    # bf16 fast mode for the conv stack (head/softmax stay fp32)
    dtype: Optional[jnp.dtype] = None
    # rematerialize each conv layer (jax.checkpoint): trades recompute
    # for memory so deep stacks on full graphs stay inside HBM — XLA's
    # scheduler is otherwise free to keep several layers' gathered edge
    # buffers live at once (measured: an 8-layer reddit-standin forward
    # wanted 49 GB at compile without it)
    remat: bool = False

    @nn.compact
    def __call__(self, g, x, impl: Optional[str] = None):
        h = nn.Dense(self.hidden_size, name="input_proj")(x)
        kw = {} if self.dtype is None else {"dtype": self.dtype}
        if self.remat:
            from dfgnn_tpu.models.conv import _CONVS

            cls = nn.remat(_CONVS[self.conv], static_argnums=(2,))
            for i in range(self.num_layers):
                h = cls(self.hidden_size, self.num_heads,
                        method=self.method, name=f"layer_{i}", **kw)(
                    g, h, impl)
        else:
            for i in range(self.num_layers):
                h = make_conv(
                    self.conv, self.hidden_size, self.num_heads,
                    method=self.method, name=f"layer_{i}", **kw,
                )(g, h, impl=impl)
        h = h.astype(jnp.float32)
        return nn.log_softmax(nn.Dense(self.num_classes, name="output_proj")(h))


class GATNet(nn.Module):
    """Multi-layer GAT with ELU between layers (parity:
    ``train_gatconv.py`` model; heads concat on hidden layers)."""

    num_classes: int
    hidden_size: int = 64
    num_layers: int = 2
    num_heads: int = 4
    negative_slope: float = 0.2
    dropout: float = 0.0
    method: str = "auto"

    @nn.compact
    def __call__(self, g, x, impl: Optional[str] = None,
                 deterministic: bool = True):
        h = x
        for i in range(self.num_layers - 1):
            h = GATConv(
                self.hidden_size,
                self.num_heads,
                negative_slope=self.negative_slope,
                dropout=self.dropout,
                method=self.method,
                name=f"layer_{i}",
            )(g, h, impl=impl, deterministic=deterministic)
            h = nn.elu(h)
        out = GATConv(
            self.num_classes, 1, dropout=self.dropout, method=self.method,
            name="out_layer",
        )(g, h, impl=impl, deterministic=deterministic)
        return nn.log_softmax(out)
