#!/usr/bin/env python
"""Dataset statistics (parity: DFGNN/utils/graph_statistics.py).

Prints node/edge counts and degree distributions for full-graph and
batched datasets.

Usage: python scripts/graph_stats.py [--dataset cora|PATTERN|all]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def full_stats(name, data_dir):
    from dfgnn_tpu.data.datasets import load_full_graph

    ds = load_full_graph(name, data_dir, quiet=True)
    deg = np.bincount(ds.rows, minlength=ds.n_nodes)
    print(f"{name:14s} nodes={ds.n_nodes:8d} edges={ds.n_edges:10d} "
          f"deg mean={deg.mean():8.1f} p50={np.percentile(deg,50):6.0f} "
          f"p99={np.percentile(deg,99):8.0f} max={deg.max():8d}"
          + ("  [synthetic]" if ds.synthetic else ""))


def batched_stats(name, data_dir):
    from dfgnn_tpu.data.datasets import load_batched

    ds = load_batched(name, data_dir, n_graphs=256, quiet=True)
    nodes = np.array([g[2] for g in ds.graphs])
    edges = np.array([len(g[0]) for g in ds.graphs])
    print(f"{name:14s} graphs={len(ds):5d} nodes/graph={nodes.mean():6.1f} "
          f"edges/graph={edges.mean():8.1f} deg={edges.mean()/max(nodes.mean(),1):6.1f} "
          f"task={ds.task}" + ("  [synthetic]" if ds.synthetic else ""))


def main(argv=None):
    from dfgnn_tpu.data.datasets import dataset_names
    from dfgnn_tpu.utils.config import build_parser, parse_args

    args = parse_args(build_parser(__doc__), argv)
    names = dataset_names()
    targets = ([args.dataset] if args.dataset != "all"
               else names["full"] + names["batched"])
    for nm in targets:
        if nm in names["full"]:
            full_stats(nm, args.data_dir)
        else:
            batched_stats(nm, args.data_dir)


if __name__ == "__main__":
    main()
