#!/usr/bin/env python
"""Cold-state vs steady-state timing for the headline configs.

The reference times its ablation with an L2 flush between iterations
(``gtconv_layer_hyper_ablation.py:8-27``); this measures the same
distinction on TPU via ``benchmark_chained_cold`` (an HBM-sweeping
reduction between iterations) and documents which regime the headline
numbers represent.  Results recorded in BASELINE.md / NOTES_r4.md.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dfgnn_tpu.data.synthetic import pattern_like_batch
    from dfgnn_tpu.data.datasets import load_full_graph
    from dfgnn_tpu.graph import DenseBatch, Graph
    from dfgnn_tpu.models import make_conv
    from dfgnn_tpu import formats
    from dfgnn_tpu.ops.bucket import bucket_graph_attention
    from dfgnn_tpu.utils.benchmark import (
        benchmark_chained, benchmark_chained_cold,
    )

    rng = np.random.default_rng(0)
    BS, DIM, HEADS = 1024, 128, 1
    graphs = [(r, c, n) for r, c, n, _ in pattern_like_batch(rng, BS)]
    batch = DenseBatch.from_graph_list(graphs, np_pad=128).device_put()
    x = jnp.asarray(rng.standard_normal(
        (batch.n_graphs * batch.np_pad, DIM)).astype(np.float32))

    def row(name, fn, *args, iters):
        warm = benchmark_chained(fn, *args, iters=iters)
        cold = benchmark_chained_cold(fn, *args, iters=iters)
        print(f"{name:>34}: steady {warm:7.3f} ms | cold {cold:7.3f} ms "
              f"({cold / max(warm, 1e-9):.2f}x)", flush=True)

    layer = make_conv("gt", out_size=DIM, num_heads=HEADS, method="flash")
    p = layer.init(jax.random.key(0), batch, x)
    row("batch GT fp32 flash", lambda x: layer.apply(p, batch, x), x,
        iters=60)

    layer16 = make_conv("gt", out_size=DIM, num_heads=HEADS,
                        dtype=jnp.bfloat16)
    p16 = layer16.init(jax.random.key(0), batch, x)
    row("batch GT bf16 dense (auto)",
        lambda x: layer16.apply(p16, batch, x), x, iters=100)

    ds = load_full_graph("reddit", "data", scale=1.0)
    gf = Graph.from_coo(ds.rows, ds.cols, ds.n_nodes)
    bgf = formats.preprocess("bucketed", gf).device_put()
    qf, kf, vf = (jnp.asarray(
        rng.standard_normal((gf.n_nodes, HEADS, DIM)).astype(np.float32))
        for _ in range(3))
    row("full-graph reddit-standin fwd",
        lambda qf, kf, vf, bgf: bucket_graph_attention(bgf, qf, kf, vf),
        qf, kf, vf, bgf, iters=4)


if __name__ == "__main__":
    main()
