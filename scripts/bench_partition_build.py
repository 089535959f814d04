#!/usr/bin/env python
"""Partitioner scalability: plan-build wall-time + padding vs n_devices.

Host-side only (numpy; no TPU needed): times ``partition_graph`` on the
reddit stand-in at n_devices in {8, 64, 256} and reports per-device edge
padding and halo-plan statistics.  Results are recorded in NOTES_r4.md.

Usage: python scripts/bench_partition_build.py [--halo] [--devices 8 64 256]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[8, 64, 256])
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--no-halo", action="store_true")
    args = ap.parse_args()

    from dfgnn_tpu.data.datasets import load_full_graph
    from dfgnn_tpu.graph import Graph
    from dfgnn_tpu.parallel.partition import partition_graph

    ds = load_full_graph("reddit", "data", scale=args.scale)
    g = Graph.from_coo(ds.rows, ds.cols, ds.n_nodes)
    e = g.n_edges
    print(f"graph: n={g.n_nodes} e={e}")
    print(f"{'P':>4} {'halo':>5} {'build_s':>8} {'pad':>6} {'max_halo':>9} "
          f"{'halo_frac':>9}")
    for halo in ([False] if args.no_halo else [False, True]):
        for P in args.devices:
            t0 = time.perf_counter()
            pg = partition_graph(g, P, halo=halo)
            dt = time.perf_counter() - t0
            pad = pg.padded_edges * P_pad_norm(pg) / e
            mh = pg.halo.max_halo if pg.halo is not None else 0
            hf = (mh / pg.n_local) if mh else 0.0
            print(f"{P:>4} {str(halo):>5} {dt:>8.2f} {pad:>6.3f} {mh:>9} "
                  f"{hf:>9.3f}", flush=True)
            del pg


def P_pad_norm(pg):
    # padded_edges already counts the stacked device axis
    return 1


if __name__ == "__main__":
    main()
