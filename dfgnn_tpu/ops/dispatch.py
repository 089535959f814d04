"""Single entry point dispatching on graph layout.

Plays the role of the reference's per-format layer classes + ``fuse`` flag
(``DFGNN/layers/util.py:362-455``): here the *layout type* selects the
strategy, and ``method`` can force a specific implementation (e.g. the
unfused oracle for cross-checking, like ``fuse=False``).
"""

from __future__ import annotations

from typing import Optional

import jax

from dfgnn_tpu.graph import DenseBatch, Graph
from dfgnn_tpu.formats import BlockedBucketedGraph, BucketedGraph
from dfgnn_tpu.ops import reference as _ref
from dfgnn_tpu.ops import dense_block as _dense
from dfgnn_tpu.ops import bucket as _bucket


def graph_attention(
    g,
    q: Optional[jax.Array],
    k: Optional[jax.Array],
    v: jax.Array,
    *,
    score: str = "dot",
    e_row: Optional[jax.Array] = None,
    e_col: Optional[jax.Array] = None,
    negative_slope: float = 0.2,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    return_weights: bool = False,
    method: str = "auto",
):
    """Fused (or oracle) SDDMM -> edge-softmax -> SpMM attention convolution.

    ``g`` may be a :class:`Graph` (oracle segment-op path), a
    :class:`BucketedGraph` (fused full-graph path) or a :class:`DenseBatch`
    (batched dense masked attention / flash kernel).

    The ``DFGNN_TPU_FORCE_METHOD`` environment variable overrides
    ``method="auto"`` globally — the ablation switch replacing the
    reference's ``alblation_mode`` env (``fused_gtconv_hyper_ablation.cu``):
    e.g. ``DFGNN_TPU_FORCE_METHOD=dense`` disables the Pallas kernel,
    ``=reference`` disables fusion entirely.
    """
    import os

    if method == "auto":
        method = os.environ.get("DFGNN_TPU_FORCE_METHOD", "auto")
    kw = dict(score=score, e_row=e_row, e_col=e_col, negative_slope=negative_slope)
    drop = dict(dropout_rate=dropout_rate, dropout_rng=dropout_rng)
    if isinstance(g, DenseBatch):
        # auto -> Pallas flash kernel (fastest AND fp32-accurate; scales
        # scores by edge values in-kernel when batch.val is present); the
        # XLA dense formulation stays reachable as method="dense", and is
        # the automatic fallback when attention weights are requested
        # (dense [B, h, P, P] weights, the materialized-attn_edge analog).
        # Autodiff note: the flash kernel treats batch.val as a CONSTANT
        # (float0 tangent — the reference's fixed A.val); code that needs
        # d(val) must pass method="dense" explicitly.
        if method in ("auto", "flash") and not return_weights:
            from dfgnn_tpu.ops.pallas import flash_mask

            return flash_mask.flash_graph_attention(g, q, k, v, **kw, **drop)
        if method in ("auto", "dense", "flash", "reference"):
            # "reference" on a DenseBatch = the unfused XLA dense
            # formulation (the oracle for this layout)
            return _dense.dense_graph_attention(
                g, q, k, v, **kw, **drop, return_weights=return_weights)
        raise ValueError(f"method {method!r} invalid for DenseBatch")
    if isinstance(g, (BucketedGraph, BlockedBucketedGraph)):
        if method in ("auto", "bucket"):
            return _bucket.bucket_graph_attention(
                g, q, k, v, **kw, **drop, return_weights=return_weights)
        raise ValueError(f"method {method!r} invalid for {type(g).__name__}")
    from dfgnn_tpu.parallel.partition import EdgePartitionedGraph

    if isinstance(g, EdgePartitionedGraph):
        if return_weights:
            raise NotImplementedError(
                "return_weights is not available on the distributed path")
        if g.mesh is None:
            raise ValueError("EdgePartitionedGraph needs mesh= set (partition_graph(..., mesh=mesh))")
        if method in ("auto", "dist"):
            from dfgnn_tpu.parallel.partition import dist_graph_attention

            return dist_graph_attention(
                g, g.mesh, q, k, v, axis=g.axis, **kw, **drop
            )
        raise ValueError(f"method {method!r} invalid for EdgePartitionedGraph")
    from dfgnn_tpu.data.sampling import SampledBlock, sampled_block_attention

    if isinstance(g, SampledBlock):
        if return_weights:
            raise NotImplementedError(
                "return_weights is not available on the sampled-block path")
        if dropout_rate > 0.0:
            raise NotImplementedError(
                "attention dropout is not implemented on the sampled-block "
                "path (never silently ignored)")
        if method in ("auto", "sampled", "bucket"):
            return sampled_block_attention(g, q, k, v, **kw)
        raise ValueError(f"method {method!r} invalid for SampledBlock")
    if isinstance(g, Graph):
        if method in ("auto", "reference"):
            return _ref.graph_attention_reference(
                g, q, k, v, **kw, **drop, return_weights=return_weights)
        raise ValueError(f"method {method!r} invalid for Graph")
    raise TypeError(f"unsupported graph layout {type(g)!r}")
