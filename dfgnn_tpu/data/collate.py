"""Batched-graph collation + mini-batch iteration.

Role of the reference's ``GraphDataLoader`` usage
(``script/test/test_batch_graph.py:67-71``: DGL collates ``bs`` subgraphs
into one block-diagonal graph).  Here a batch collates into the TPU-native
:class:`DenseBatch` (padded per-graph dense masks) plus flat feature/label
tensors whose node order matches ``b * np_pad + i``; an equivalent
block-diagonal :class:`Graph` is available for oracle cross-checks.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from dfgnn_tpu.data.datasets import BatchedGraphDataset
from dfgnn_tpu.graph import DenseBatch


def collate_dense(
    ds: BatchedGraphDataset,
    idx,
    np_pad: Optional[int] = None,
):
    """Collate graphs ``idx`` -> (DenseBatch, features, labels, label_mask).

    Features are flat ``[B * np_pad, ...]`` with zero/pad rows masked;
    node-level labels are flat with -1 padding; graph-level labels are
    ``[B, ...]``.
    """
    graphs = [ds.graphs[i] for i in idx]
    batch = DenseBatch.from_graph_list(
        [(r, c, n) for (r, c, n) in graphs], np_pad=np_pad
    )
    B, Pp = batch.n_graphs, batch.np_pad

    f0 = ds.node_features[idx[0]]
    feat_shape = f0.shape[1:] if f0.ndim > 1 else ()
    feats = np.zeros((B * Pp, *feat_shape), dtype=f0.dtype)
    for b, i in enumerate(idx):
        n = graphs[b][2]
        feats[b * Pp : b * Pp + n] = ds.node_features[i]

    if ds.task == "node_classification":
        labels = np.full(B * Pp, -1, dtype=np.int64)
        for b, i in enumerate(idx):
            n = graphs[b][2]
            labels[b * Pp : b * Pp + n] = ds.labels[i]
        label_mask = labels >= 0
    else:
        labels = np.asarray([ds.labels[i] for i in idx])
        label_mask = np.ones(len(idx), bool)
    return batch, feats, labels, label_mask


def batch_iterator(
    ds: BatchedGraphDataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    np_pad: Optional[int] = None,
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator:
    order = np.arange(len(ds))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    stop = len(ds) - (len(ds) % batch_size if drop_last else 0)
    for s in range(0, stop, batch_size):
        idx = order[s : s + batch_size]
        if len(idx) == 0:
            break
        yield collate_dense(ds, idx, np_pad=np_pad)
