#!/usr/bin/env python
"""Multi-chip scaling benchmark for the edge-partitioned full-graph path.

Measures fused distributed attention throughput at mesh sizes
{1, 2, 4, ..., n_devices} on one graph and reports scaling efficiency
(BASELINE.json target: >=80% edges/s scaling).  On a single-chip CI host
this runs on the virtual CPU mesh (correctness/compile validation; absolute
numbers are not TPU numbers — run on a pod slice for the real measurement).

Usage:
    python scripts/bench_scaling.py --dataset reddit --dim 64
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    if os.environ.get("DFGNN_SCALING_CPU"):
        # validate on the virtual 8-device CPU mesh (correctness only)
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"

    import jax

    if os.environ.get("DFGNN_SCALING_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from dfgnn_tpu.data.datasets import load_full_graph
    from dfgnn_tpu.graph import Graph
    from dfgnn_tpu.parallel import make_mesh
    from dfgnn_tpu.parallel.partition import partition_graph, dist_graph_attention
    from dfgnn_tpu.utils.benchmark import benchmark_chained
    from dfgnn_tpu.utils.config import build_parser, parse_args

    args = parse_args(build_parser(__doc__), argv)
    ds = load_full_graph(args.dataset, args.data_dir)
    g = Graph.from_coo(ds.rows, ds.cols, ds.n_nodes)
    rng = np.random.default_rng(0)
    h, f = args.heads, args.dim // args.heads

    n_total = len(jax.devices())
    sizes = [d for d in [1, 2, 4, 8, 16, 32] if d <= n_total]
    use_halo = bool(os.environ.get("DFGNN_HALO"))
    reorder = os.environ.get("DFGNN_REORDER") or None  # "lpa" | "bfs"
    base_eps = None
    for nd in sizes:
        mesh = make_mesh(nd)
        pg = partition_graph(g, nd, mesh=mesh, halo=use_halo and nd > 1,
                             reorder=reorder)
        n_pad = pg.n_local * pg.n_devices
        # comm model: rows received per device per exchanged operand x
        # row bytes (dot mode exchanges k and v)
        row_bytes = h * f * 4
        comm_mb = pg.comm_rows_per_device() * row_bytes * 2 / 1e6
        pad_factor = pg.padded_edges / max(g.n_edges, 1)
        q, k, v = (
            jnp.asarray(rng.standard_normal((n_pad, h, f)).astype(np.float32))
            for _ in range(3)
        )
        ms = benchmark_chained(
            lambda k, q, v, pg: dist_graph_attention(pg, mesh, q, k, v),
            k, q, v, pg, iters=5,
        )
        eps = g.n_edges / (ms / 1e3)
        if base_eps is None:
            base_eps = eps
        eff = eps / (base_eps * nd) * 100
        print(f"devices={nd:3d}: {ms:8.2f} ms  {eps:.3e} edges/s  "
              f"scaling-efficiency={eff:5.1f}%  comm={comm_mb:.1f} MB/dev/layer"
              f"  pad={pad_factor:.2f}x"
              f"{'  [halo]' if pg.halo is not None else ''}"
              f"{'  [reorder]' if reorder else ''}", flush=True)


if __name__ == "__main__":
    main()
