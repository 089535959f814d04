#!/usr/bin/env python
"""Full-graph h=4 slowdown: is the packed-table slice the culprit?

The packed k||v table rows are [h, 2f]; at h=4/f=32 the per-head k and v
slices (kv[..., :f] / kv[..., f:]) are STRIDED in the minor dim, which
can force a relayout of every gathered 16MB chunk.  packed=False uses
separate k and v tables (each gather fused into its single consumer, no
slices) at the cost of 2 gathers per edge instead of 1.

Times the reddit-standin bucket forward at h in {1, 4} x packed
in {True, False}.  (VERDICT r4 weak #2 follow-up; see results/heads.json
for the 5.3x packed h=4 number.)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    import jax.numpy as jnp

    from dfgnn_tpu.data.datasets import load_full_graph
    from dfgnn_tpu.graph import Graph
    from dfgnn_tpu.ops.bucket import bucket_graph_attention
    from dfgnn_tpu.utils.benchmark import benchmark_chained_stats
    from dfgnn_tpu import formats

    rng = np.random.default_rng(0)
    DIM = 128
    ds = load_full_graph("reddit", "data")
    g = Graph.from_coo(ds.rows, ds.cols, ds.n_nodes)
    bg = formats.preprocess("bucketed", g).device_put()
    for heads in (1, 4):
        f = DIM // heads
        q, k, v = (jnp.asarray(rng.standard_normal(
            (g.n_nodes, heads, f)).astype(np.float32)) for _ in range(3))
        for packed in (True, False):
            ms, sp = benchmark_chained_stats(
                lambda q, k, v, bg, packed=packed: bucket_graph_attention(
                    bg, q, k, v, packed=packed),
                q, k, v, bg, iters=5, reps=3)
            print(f"h={heads} packed={packed}: {ms:8.2f} ± {sp:.2f} ms "
                  f"({g.n_edges / (ms / 1e3):.3g} edges/s)", flush=True)


if __name__ == "__main__":
    main()
