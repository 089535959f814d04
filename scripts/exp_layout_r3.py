#!/usr/bin/env python
"""R3 experiment: full-graph layout shmoo on the real chip (scratch)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    import jax.numpy as jnp

    from dfgnn_tpu import formats
    from dfgnn_tpu.data.datasets import load_full_graph
    from dfgnn_tpu.graph import Graph
    from dfgnn_tpu.ops.bucket import bucket_graph_attention
    from dfgnn_tpu.utils.benchmark import benchmark_chained

    rng = np.random.default_rng(0)
    ds = load_full_graph("reddit", "data", scale=1.0)
    g = Graph.from_coo(ds.rows, ds.cols, ds.n_nodes)
    e = g.n_edges
    HEADS, DIM = 1, 128
    q, k, v = (jnp.asarray(rng.standard_normal(
        (g.n_nodes, HEADS, DIM)).astype(np.float32)) for _ in range(3))

    cases = [
        ("default pow2 min16 split64 blocked(3)", dict(), None),
        ("x1.5 min8 split64 blocked(3)",
         dict(min_width=8, ladder="x1.5"), None),
        ("pure seg w=8 blocked(3)",
         dict(min_width=8, split_width=8, widths=[8]), None),
        ("pure seg w=16 blocked(3)",
         dict(min_width=16, split_width=16, widths=[16]), None),
        ("x1.5 min8 split16 blocked(3)",
         dict(min_width=8, split_width=16, ladder="x1.5"), None),
        ("x1.5 min8 split64 blocked(2)",
         dict(min_width=8, ladder="x1.5", src_block_rows=116544), None),
        ("pure seg w=8 blocked(2)",
         dict(min_width=8, split_width=8, widths=[8],
              src_block_rows=116544), None),
        ("x1.5 min8 split64 flat", dict(min_width=8, ladder="x1.5",
                                        src_block_rows=None), None),
        ("x1.5 min8 split64 blocked(3) bf16",
         dict(min_width=8, ladder="x1.5"), jnp.bfloat16),
        ("pure seg w=8 blocked(2) bf16",
         dict(min_width=8, split_width=8, widths=[8],
              src_block_rows=116544), jnp.bfloat16),
        ("x1.5 min8 split64 flat bf16",
         dict(min_width=8, ladder="x1.5", src_block_rows=None), jnp.bfloat16),
    ]
    for label, kw, gdt in cases:
        bg = formats.build_buckets(g, **kw).device_put()
        ms = benchmark_chained(
            lambda q, k, v, bg: bucket_graph_attention(bg, q, k, v,
                                                       gather_dtype=gdt),
            q, k, v, bg, iters=8)
        pad = bg.padded_edges / e
        print(f"{label:45s} {ms:8.2f} ms  pad {pad:.3f}  "
              f"{e/(ms/1e3):.3e} e/s", flush=True)
        del bg


if __name__ == "__main__":
    main()
