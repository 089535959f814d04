#!/usr/bin/env python
"""heads>1 evidence row (VERDICT r4 weak #2): every TPU perf number so
far is heads=1; the kernels carry a head grid dimension (flash grid
(B//G, h); bucket tables [n, h, f]) and CPU tests run h=2, but a
head-grid pipelining regression would be invisible.  This script times
the batched implementations and the full-graph bucket path at heads=4
(dim 128 TOTAL, so per-head f=32 — the reference's --heads semantics,
``parser_argument`` ``DFGNN/utils/util.py:420-446``) next to heads=1.

Usage: python scripts/exp_heads.py [--store-result results/heads.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--store-result", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dfgnn_tpu.data.datasets import load_full_graph
    from dfgnn_tpu.data.synthetic import pattern_like_batch
    from dfgnn_tpu.graph import DenseBatch, Graph
    from dfgnn_tpu.models import make_conv
    from dfgnn_tpu.ops.bucket import bucket_graph_attention
    from dfgnn_tpu.utils.benchmark import benchmark_chained_stats
    from dfgnn_tpu import formats

    rng = np.random.default_rng(0)
    DIM = 128
    out = {}

    # batched PATTERN-like bs=1024, bf16 (the auto-default arena)
    graphs = [(r, c, n) for r, c, n, _ in pattern_like_batch(rng, 1024)]
    batch = DenseBatch.from_graph_list(graphs, np_pad=128).device_put()
    x = jnp.asarray(rng.standard_normal(
        (batch.n_graphs * batch.np_pad, DIM)).astype(np.float32))
    for heads in (1, 4):
        impls = ("flash", "dense", "flash_fused")
        layer = make_conv("gt", out_size=DIM, num_heads=heads,
                          dtype=jnp.bfloat16)
        p = layer.init(jax.random.key(0), batch, x)
        for impl in impls:
            ms, sp = benchmark_chained_stats(
                lambda x, impl=impl: layer.apply(p, batch, x, impl=impl),
                x, iters=100, reps=5)
            key = f"batch_gt_h{heads}_{impl}"
            out[key] = {"ms": round(ms, 4), "spread": round(sp, 4)}
            print(f"{key}: {ms:.3f} ± {sp:.3f} ms", flush=True)

    # full-graph bucket path, fp32 (the headline full-graph arena)
    ds = load_full_graph("reddit", "data")
    g = Graph.from_coo(ds.rows, ds.cols, ds.n_nodes)
    bg = formats.preprocess("bucketed", g).device_put()
    for heads in (1, 4):
        f = DIM // heads
        q, k, v = (jnp.asarray(rng.standard_normal(
            (g.n_nodes, heads, f)).astype(np.float32)) for _ in range(3))
        ms, sp = benchmark_chained_stats(
            lambda q, k, v, bg: bucket_graph_attention(bg, q, k, v),
            q, k, v, bg, iters=5, reps=3)
        key = f"full_gt_h{heads}"
        out[key] = {"ms": round(ms, 3), "spread": round(sp, 3),
                    "edges_per_s": round(g.n_edges / (ms / 1e3))}
        print(f"{key}: {ms:.2f} ± {sp:.2f} ms "
              f"({out[key]['edges_per_s']:.3g} edges/s)", flush=True)

    if args.store_result:
        with open(args.store_result, "w") as fh:
            json.dump(out, fh, indent=1)
        print("stored", args.store_result)


if __name__ == "__main__":
    main()
