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

    p = build_parser(__doc__)
    p.add_argument(
        "--oracle-edge-cap", type=int, default=4_000_000,
        help="edge count above which the unfused oracle runs on a random "
             "edge-subsampled graph (its O(E*dim) gathered temporaries "
             "exceed HBM at super-node scale) and is compared by edges/s "
             "rate — the bench.py sub-batch methodology")
    args = parse_args(p, argv)
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

    oracle_sub = g.n_edges > args.oracle_edge_cap
    if oracle_sub:
        sub = np.random.default_rng(0).choice(
            g.n_edges, args.oracle_edge_cap, replace=False)
        e = g.n_edges
        g_ref = Graph.from_coo(np.asarray(g.rows)[:e][sub],
                               np.asarray(g.cols)[:e][sub], g.n_nodes)
        print(f"  oracle runs on a {args.oracle_edge_cap}-edge subsample "
              f"(full graph exceeds the oracle's HBM budget); comparison "
              f"is by edges/s; correctness checked on the subsample")
    else:
        g_ref = g
    # init on the (possibly subsampled) graph: params depend only on
    # feature dims, and tracing the oracle on a super-node full graph
    # would blow both the compile-request size limit and HBM
    params = layer.init(jax.random.key(0), g_ref, x, impl="reference")

    layouts = {"reference": g_ref.device_put()}
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
        n_e = g_ref.n_edges if fmt == "reference" else g.n_edges
        if args.profile:
            # trace one timed call (reference --profile bracket,
            # DFGNN/utils/util.py:325-348)
            with profile_region(f"full_{args.dataset}_{fmt}"):
                jax.block_until_ready(layer.apply(params, gg, x))
        # layout rides as a jit ARGUMENT (a closed-over device array gets
        # embedded as a compile-time constant — at full-graph scale that
        # blows the compile request and HBM)
        ms = benchmark_chained(
            lambda x, gg: layer.apply(params, gg, x), x, gg, iters=10
        )
        eps = n_e / (ms / 1e3)
        # correctness at HIGHEST matmul precision: timing runs the
        # production default (bf16-multiply f32 matmuls on the MXU),
        # whose ~1e-2 rounding on dim-128 dots is implementation-
        # independent noise that the rtol=1e-3 bar would misflag
        if fmt == "reference":
            with jax.default_matmul_precision("highest"):
                ref_out = layer.apply(params, gg, x)
        elif ref_out is not None:
            # correctness on the oracle's graph (subsampled when capped)
            cmp_gg = (build_buckets(g_ref).device_put() if oracle_sub
                      and fmt == "bucket" else gg)
            with jax.default_matmul_precision("highest"):
                out = layer.apply(params, cmp_gg, x)
            n = min(out.shape[0], ref_out.shape[0])
            # atol=1e-4: fp32 score accumulation differs between the
            # segment-op oracle and the bucketed chunk walk by ~1e-5 in
            # the scores; exp amplifies that to ~2e-5 absolute on the
            # outputs (measured on arxiv/reddit stand-ins) — order-of-
            # summation noise, 4 orders below a wrong-edge defect.  The
            # rtol=1e-3 relative bar (the reference's) is unchanged.
            ok = check_correct(np.asarray(out)[:n], np.asarray(ref_out)[:n],
                               atol=1e-4)
            print(f"  [{fmt}] correctness vs oracle: {'OK' if ok else 'FAIL'}")
        results[fmt] = {"ms": float(ms), "edges_per_s": float(eps),
                        "n_edges": int(n_e)}
        print(f"  [{fmt}] {ms:.3f} ms   {eps:.3e} edges/s"
              + ("  (subsampled)" if fmt == "reference" and oracle_sub
                 else ""))

    if args.store_result:
        os.makedirs("results", exist_ok=True)
        out = f"results/full_{args.dataset}_{args.conv}_{args.dim}.json"
        with open(out, "w") as f:
            json.dump({"args": vars(args), "results": results}, f, indent=2)
        print("stored", out)


if __name__ == "__main__":
    main()
