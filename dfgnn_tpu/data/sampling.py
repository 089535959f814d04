"""Neighborhood sampling for mini-batch training on large graphs.

New capability named in the build target (BASELINE.json north star:
"... plus neighborhood sampling and sparse gather/scatter in JAX/XLA");
the reference itself is full-graph/batched only.

Design: GraphSAGE-style layered uniform sampling, host-side (C++ fast path
via :mod:`dfgnn_tpu.native`, numpy fallback).  A sampled layer is exactly a
single fixed-width :class:`~dfgnn_tpu.formats.Bucket` — ``[n_seeds,
fanout]`` padded neighbor ids — so the fused bucketed attention path
consumes sampled blocks with no extra formats: ``width == fanout`` is the
static shape, and re-sampling never changes shapes, so one jit trace serves
the whole training run.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from flax import struct

from dfgnn_tpu.formats import Bucket, BucketedGraph
from dfgnn_tpu.graph import Graph, _round_up
from dfgnn_tpu import native


@struct.dataclass
class SampledBlock:
    """One message-passing layer's sampled bipartite block.

    ``bg`` computes ``out[i] = attn-aggregate over nbr[i]`` for seed i;
    ``seeds`` are global node ids of the output rows; ``nbr`` references
    *global* node ids (gathers read from full feature tensors).
    """

    bg: BucketedGraph
    seeds: np.ndarray        # [s_pad] global ids (sentinel n_nodes)
    n_seeds: int = struct.field(pytree_node=False, default=0)

    def device_put(self, sharding=None):
        from dfgnn_tpu.graph import device_put

        return device_put(self, sharding)


class NeighborSampler:
    """Uniform fixed-fanout sampler over one host-resident CSR graph."""

    def __init__(self, g: Graph):
        self.n = g.n_nodes
        self.indptr = np.asarray(g.indptr, dtype=np.int64)
        self.cols = np.asarray(g.cols, dtype=np.int64)

    def sample_layer(self, seeds: np.ndarray, fanout: int, seed: int,
                     *, seed_pad_multiple: int = 128) -> SampledBlock:
        seeds = np.asarray(seeds, dtype=np.int64)
        s = len(seeds)
        s_pad = max(_round_up(s, seed_pad_multiple), seed_pad_multiple)

        res = native.sample_neighbors_native(
            seeds, self.indptr, self.cols, fanout, self.n, seed
        )
        if res is None:
            rng = np.random.default_rng(seed)
            nbr = np.full((s, fanout), self.n, dtype=np.int32)
            mask = np.zeros((s, fanout), dtype=bool)
            for i, r in enumerate(seeds):
                lo, hi = self.indptr[r], self.indptr[r + 1]
                d = hi - lo
                if d <= fanout:
                    nbr[i, :d] = self.cols[lo:hi]
                    mask[i, :d] = True
                else:
                    pick = rng.choice(d, size=fanout, replace=False)
                    nbr[i] = self.cols[lo + pick]
                    mask[i] = True
        else:
            nbr, mask = res

        nbr_p = np.full((s_pad, fanout), self.n, dtype=np.int32)
        mask_p = np.zeros((s_pad, fanout), dtype=bool)
        nbr_p[:s] = nbr
        mask_p[:s] = mask
        # local row ids 0..s-1 (output is seed-indexed)
        row_ids = np.full(s_pad, s_pad, dtype=np.int32)
        row_ids[:s] = np.arange(s, dtype=np.int32)
        seeds_p = np.full(s_pad, self.n, dtype=np.int64)
        seeds_p[:s] = seeds

        bucket = Bucket(
            row_ids=row_ids, nbr=nbr_p, emask=mask_p, val=None,
            width=int(fanout), n_rows=int(s),
            row_chunk=int(max(8, (1 << 15) // fanout)),
        )
        bg = BucketedGraph(buckets=(bucket,), n_nodes=s_pad, n_edges=int(mask.sum()))
        return SampledBlock(bg=bg, seeds=seeds_p, n_seeds=s)

    def sample(self, seeds: np.ndarray, fanouts: Sequence[int], seed: int,
               pad_to: Optional[Sequence[int]] = None) -> List[SampledBlock]:
        """Layered sampling, output-layer first (blocks[0] aggregates into
        the seed nodes; blocks[-1] is the input-most layer).  Each deeper
        layer's seed set is the union of the previous layer's seeds and
        sampled neighbors (GraphSAGE frontier expansion).

        ``pad_to`` fixes each layer's padded seed count so every mini-batch
        shares one jit trace (frontiers exceeding the cap are truncated —
        standard sampling approximation)."""
        blocks = []
        frontier = np.asarray(seeds, dtype=np.int64)
        for li, fanout in enumerate(fanouts):
            pad = None if pad_to is None else int(pad_to[li])
            if pad is not None and len(frontier) > pad:
                frontier = frontier[:pad]
            blk = self.sample_layer(
                frontier, fanout, seed * 1000003 + li,
                seed_pad_multiple=pad if pad is not None else 128,
            )
            blocks.append(blk)
            nbrs = blk.bg.buckets[0].nbr
            real = nbrs[nbrs < self.n]
            frontier = np.unique(np.concatenate([frontier, real.astype(np.int64)]))
        return blocks

    def sample_localized(
        self, seeds: np.ndarray, fanouts: Sequence[int], seed: int,
        pad_to: Sequence[int], support_pad: int,
    ) -> Tuple[List[SampledBlock], np.ndarray]:
        """Layered sampling with BLOCK-LOCAL indices.

        Unlike :meth:`sample` (whose blocks reference *global* node ids and
        therefore force full-graph-sized feature buffers between layers),
        the returned blocks are chained: block li's ``nbr`` and ``seeds``
        index into the NEXT deeper block's output rows (and the deepest
        block indexes into the returned ``support`` array of global ids, the
        input gather list).  A training step's feature tensors are then all
        O(batch * prod(fanouts)) — full-graph cost never enters the step.

        Returns ``(blocks, support)`` where ``support`` is ``[support_pad]``
        global ids (sentinel ``n_nodes``); gather the input features as
        ``x_full[support]`` and run blocks in ``reversed`` order.  Frontier
        or support overflow beyond the static caps is truncated (standard
        sampling approximation; overflowing edges are masked out).
        """
        blocks = self.sample(seeds, fanouts, seed, pad_to=pad_to)
        last = blocks[-1].bg.buckets[0]
        nbrs = np.asarray(last.nbr)
        real = nbrs[nbrs < self.n].astype(np.int64)
        lseeds = np.asarray(blocks[-1].seeds)
        sup = np.unique(np.concatenate([lseeds[lseeds < self.n], real]))
        sup = sup[:support_pad]
        sup_p = np.full(support_pad, self.n, dtype=np.int64)
        sup_p[: sup.size] = sup
        refs = [
            (np.asarray(blocks[li + 1].seeds), blocks[li + 1].n_seeds)
            for li in range(len(blocks) - 1)
        ] + [(sup_p, int(sup.size))]
        out = []
        for blk, (ref, ref_real) in zip(blocks, refs):
            b = blk.bg.buckets[0]
            sent = ref.shape[0]
            nbr_loc, found = _localize(
                np.asarray(b.nbr).ravel(), ref, ref_real, sent)
            nbr_loc = nbr_loc.reshape(b.nbr.shape)
            emask = np.asarray(b.emask) & found.reshape(b.nbr.shape)
            seeds_loc, _ = _localize(np.asarray(blk.seeds), ref, ref_real,
                                     sent)
            bucket = b.replace(nbr=nbr_loc, emask=emask)
            bg = BucketedGraph(
                buckets=(bucket,), n_nodes=blk.bg.n_nodes,
                n_edges=int(emask.sum()))
            out.append(SampledBlock(bg=bg, seeds=seeds_loc,
                                    n_seeds=blk.n_seeds))
        return out, sup_p


def _localize(ids: np.ndarray, ref: np.ndarray, ref_real: int,
              sentinel: int) -> Tuple[np.ndarray, np.ndarray]:
    """Positions of ``ids`` within ``ref[:ref_real]`` (missing/padded ->
    ``sentinel``).  Returns (local ids int32, found mask)."""
    ids = np.asarray(ids, dtype=np.int64)
    if ref_real == 0:
        return (np.full(ids.shape, sentinel, np.int32),
                np.zeros(ids.shape, bool))
    ref_r = np.asarray(ref[:ref_real], dtype=np.int64)
    order = np.argsort(ref_r, kind="stable")
    sref = ref_r[order]
    pos = np.clip(np.searchsorted(sref, ids), 0, ref_real - 1)
    found = sref[pos] == ids
    loc = np.where(found, order[pos], sentinel)
    return loc.astype(np.int32), found


def sampled_block_attention(
    block: SampledBlock,
    q,
    k,
    v,
    *,
    score: str = "dot",
    e_row=None,
    e_col=None,
    negative_slope: float = 0.2,
):
    """Fused attention over one sampled block.

    ``q``/``e_row`` and ``k``/``v``/``e_col`` are FULL-graph node tensors;
    the block's seed rows are gathered for the query side and the sampled
    neighbor ids gather the source side.  Returns ``[s_pad, h, f]`` rows
    aligned with ``block.seeds``.
    """
    import jax.numpy as jnp

    from dfgnn_tpu.ops.bucket import bucket_graph_attention

    take = lambda x: None if x is None else jnp.take(x, block.seeds, axis=0, mode="clip")
    return bucket_graph_attention(
        block.bg,
        take(q),
        k,
        v,
        score=score,
        e_row=take(e_row),
        e_col=e_col,
        negative_slope=negative_slope,
    )
