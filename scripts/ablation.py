#!/usr/bin/env python
"""Ablation sweep: isolate each optimization layer's contribution.

Parity: ``bash/ablation_test.sh`` + the ``alblation_mode`` env kernels
(``fused_gtconv_hyper_ablation.cu``, SURVEY.md N6/N15).  The reference
ablates CUDA kernel tricks (warp-balanced SDDMM, redundancy-free softmax,
vectorized SpMM); the TPU equivalents are strategy/layout choices, swept
here on one dataset:

batched (PATTERN-like):
  reference -> dense (XLA masked) -> flash (Pallas kernel)
  -> flash_fused (whole layer, one kernel)
full graph (reddit-like):
  reference -> flat buckets, pow2 ladder, no segments -> +x1.5 ladder
  -> +segments -> +source blocking -> +packed k||v gather

Usage:
    python scripts/ablation.py [--dim 128] [--batch-size 256]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from dfgnn_tpu import formats
    from dfgnn_tpu.data.datasets import load_full_graph
    from dfgnn_tpu.data.synthetic import pattern_like_batch
    from dfgnn_tpu.graph import DenseBatch, Graph
    from dfgnn_tpu.models import make_conv
    from dfgnn_tpu.ops.bucket import bucket_graph_attention
    from dfgnn_tpu.ops.dispatch import graph_attention
    from dfgnn_tpu.utils.benchmark import benchmark_chained
    from dfgnn_tpu.utils.config import build_parser, parse_args

    args = parse_args(build_parser(__doc__), argv)
    rng = np.random.default_rng(0)
    dim, heads = args.dim, args.heads

    print("=== batched (PATTERN-like) ===", flush=True)
    graphs = [(r, c, n) for r, c, n, _ in pattern_like_batch(rng, args.batch_size)]
    batch = DenseBatch.from_graph_list(graphs, np_pad=128).device_put()
    x = jnp.asarray(rng.standard_normal(
        (batch.n_graphs * batch.np_pad, dim)).astype(np.float32))
    sub = DenseBatch.from_graph_list(graphs[:32], np_pad=128)
    g_sub = sub.to_graph().device_put()
    for label, fn, n_e in [
        ("reference (oracle, 32-graph sub-batch)",
         lambda x: make_conv("gt", dim, heads).apply(
             params, g_sub, x[: g_sub.n_nodes], impl="reference"),
         g_sub.n_edges),
        ("dense (XLA masked attention)",
         lambda x: layer.apply(params, batch, x, impl="dense"), batch.n_edges),
        ("flash (Pallas kernel)",
         lambda x: layer.apply(params, batch, x, impl="flash"), batch.n_edges),
        ("flash_fused (QKV proj + attention, 1 kernel)",
         lambda x: layer.apply(params, batch, x, impl="flash_fused"),
         batch.n_edges),
    ]:
        layer = make_conv("gt", out_size=dim, num_heads=heads)
        params = layer.init(jax.random.key(0), batch, x)
        ms = benchmark_chained(fn, x, iters=10)
        print(f"  {label:44s} {ms:8.3f} ms  {n_e/(ms/1e3):.3e} edges/s",
              flush=True)

    print("=== full graph (reddit-like, quarter scale) ===", flush=True)
    ds = load_full_graph("reddit", "data", scale=0.25)
    g = Graph.from_coo(ds.rows, ds.cols, ds.n_nodes)
    q, k, v = (jnp.asarray(rng.standard_normal(
        (g.n_nodes, heads, dim // heads)).astype(np.float32)) for _ in range(3))
    layouts = [
        ("flat pow2 buckets, no segments",
         formats.build_buckets(g, widths=[8 << i for i in range(11)],
                               split_width=None, src_block_rows=None)),
        ("+ x1.5 width ladder",
         formats.build_buckets(g, split_width=None, src_block_rows=None)),
        ("+ segment split of super-wide rows",
         formats.build_buckets(g, src_block_rows=None)),
        ("+ source blocking (forced)",
         formats.build_buckets(g, src_block_rows=32768)),
        ("+ packed k||v single gather per edge",
         formats.build_buckets(g, src_block_rows=32768)),
    ]
    ref_ms = benchmark_chained(
        lambda q, k, v: graph_attention(g.device_put(), q, k, v,
                                        method="reference"),
        q, k, v, iters=3)
    print(f"  {'reference (oracle segment ops)':44s} {ref_ms:8.3f} ms  "
          f"{g.n_edges/(ref_ms/1e3):.3e} edges/s", flush=True)
    for label, layout in layouts:
        layout = layout.device_put()
        packed = label.startswith("+ packed")
        ms = benchmark_chained(
            lambda q, k, v, layout, packed=packed: bucket_graph_attention(
                layout, q, k, v, packed=packed),
            q, k, v, layout, iters=10)
        pad = layout.padded_edges / g.n_edges
        print(f"  {label:44s} {ms:8.3f} ms  {g.n_edges/(ms/1e3):.3e} edges/s"
              f"  (pad {pad:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
