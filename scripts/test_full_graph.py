#!/usr/bin/env python
"""Full-graph kernel benchmark with correctness cross-checks.

Parity: ``DFGNN/script/test/test_full_graph.py`` — per-format timing on one
large graph; ``--format all_fg`` sweeps oracle+fused; ``--format
all_fg_super`` runs the super-node strategies (here: the same bucketed path,
whose wide buckets stream with online softmax); ``--format dist`` runs the
edge-partitioned multi-chip path.

Usage:
    python scripts/test_full_graph.py --dataset cora --dim 128 --conv gt \
        --format all_fg
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def print_graph_struct(ds):
    deg = np.bincount(ds.rows, minlength=ds.n_nodes)
    print(
        f"graph {ds.name}: nodes={ds.n_nodes} edges={ds.n_edges} "
        f"avg_deg={deg.mean():.1f} max_deg={deg.max()}"
        + (" [synthetic]" if ds.synthetic else "")
    )


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from dfgnn_tpu.data.datasets import load_full_graph
    from dfgnn_tpu.formats import build_buckets
    from dfgnn_tpu.graph import Graph
    from dfgnn_tpu.models import make_conv
    from dfgnn_tpu.utils.benchmark import benchmark_chained, check_correct
    from dfgnn_tpu.utils.config import build_parser, parse_args, resolve_format

    args = parse_args(build_parser(__doc__), argv)
    if args.format in ("all_fg", "all_fg_super", "all"):
        formats = ["reference", "bucket"]
    else:
        formats = [resolve_format(args.format)]

    ds = load_full_graph(args.dataset, args.data_dir)
    print_graph_struct(ds)
    g = Graph.from_coo(ds.rows, ds.cols, ds.n_nodes)
    x = jnp.asarray(ds.features[:, : args.dim].astype(np.float32))
    if x.shape[1] < args.dim:
        x = jnp.pad(x, [(0, 0), (0, args.dim - x.shape[1])])

    layer = make_conv(args.conv, out_size=args.dim, num_heads=args.heads)
    params = layer.init(jax.random.key(0), g, x, impl="reference")

    layouts = {"reference": g.device_put()}
    if "bucket" in formats or "dist" in formats:
        layouts["bucket"] = build_buckets(g).device_put()
    if "dist" in formats:
        from dfgnn_tpu.parallel import make_mesh
        from dfgnn_tpu.parallel.partition import partition_graph

        n_dev = args.n_devices or len(jax.devices())
        mesh = make_mesh(n_dev)
        layouts["dist"] = partition_graph(g, n_dev, mesh=mesh)

    from dfgnn_tpu.utils.profiling import profile_region

    results = {}
    ref_out = None
    for fmt in formats:
        gg = layouts[fmt]
        if args.profile:
            # trace one timed call (reference --profile bracket,
            # DFGNN/utils/util.py:325-348)
            with profile_region(f"full_{args.dataset}_{fmt}"):
                jax.block_until_ready(layer.apply(params, gg, x))
        ms = benchmark_chained(
            lambda x: layer.apply(params, gg, x), x, iters=10
        )
        eps = g.n_edges / (ms / 1e3)
        out = layer.apply(params, gg, x)
        if fmt == "reference":
            ref_out = out
        elif ref_out is not None:
            n = min(out.shape[0], ref_out.shape[0])
            ok = check_correct(np.asarray(out)[:n], np.asarray(ref_out)[:n])
            print(f"  [{fmt}] correctness vs oracle: {'OK' if ok else 'FAIL'}")
        results[fmt] = {"ms": float(ms), "edges_per_s": float(eps)}
        print(f"  [{fmt}] {ms:.3f} ms   {eps:.3e} edges/s")

    if args.store_result:
        os.makedirs("results", exist_ok=True)
        out = f"results/full_{args.dataset}_{args.conv}_{args.dim}.json"
        with open(out, "w") as f:
            json.dump({"args": vars(args), "results": results}, f, indent=2)
        print("stored", out)


if __name__ == "__main__":
    main()
