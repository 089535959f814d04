#!/usr/bin/env python
"""R3 experiment: e2e gather rate vs bucket width (scratch)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    import jax.numpy as jnp

    from dfgnn_tpu import formats
    from dfgnn_tpu.graph import Graph
    from dfgnn_tpu.ops.bucket import bucket_graph_attention
    from dfgnn_tpu.utils.benchmark import benchmark_chained

    rng = np.random.default_rng(0)
    N = 81920            # sources: one fast-rate block (80MB packed fp32)
    E_TARGET = 4 << 20   # ~4.2M edges per case
    HEADS, DIM = 1, 128
    k, v = (jnp.asarray(rng.standard_normal(
        (N, HEADS, DIM)).astype(np.float32)) for _ in range(2))

    q = jnp.asarray(rng.standard_normal(
        (N, HEADS, DIM)).astype(np.float32))
    for W in (8, 16, 32, 64, 128, 256, 512):
        n_rows = min(E_TARGET // W, N)
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), W)
        cols = rng.integers(0, N, size=n_rows * W, dtype=np.int64)
        g = Graph.from_coo(rows, cols, N)
        bg = formats.build_buckets(
            g, widths=[W], split_width=None, src_block_rows=None,
            min_width=W).device_put()
        ms = benchmark_chained(
            lambda q, k2, v2, bg: bucket_graph_attention(bg, q, k2, v2),
            q, k, v, bg, iters=8)
        rate = ms * 1e6 / bg.padded_edges
        print(f"W={W:4d} rows={bg.padded_edges:9d} {ms:8.2f} ms  "
              f"{rate:.2f} ns/row", flush=True)
        del bg


if __name__ == "__main__":
    main()
