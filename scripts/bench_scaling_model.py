#!/usr/bin/env python
"""Multi-chip scaling-efficiency model: padding x comm vs device count.

BASELINE.json's scaling target is >=80% edges/s efficiency across a pod
slice.  Per-device step time is

    t(P) = padded_edges(P)/P * ns_per_padded_edge  +  comm_bytes(P) / bw

where ``padded_edges(P)`` is the SPMD shape-harmonized total (the
partitioner's real cost surface, NOT raw E/P) and comm is the all-gather
of the two source-side operands (k, v) per layer.  Efficiency(P) =
t(1) / (P * t(P)).

The per-padded-edge cost is the measured real-chip rate of the bucket
walk on the reddit stand-in (BENCH_r04: 109.72 ms / (14.6e6 * 1.434
padded edges) = 5.24 ns); the ICI bandwidth is a stated parameter (no
multi-chip hardware in this environment — the compute term is measured,
the comm term is modeled).

This script sweeps P in {2, 8, 64, 256} with the degree-balanced
row assignment (``balance=True``, the default) and without
(``balance=False``, the pre-r5 behavior), reporting the padded-edge
factor, plan build time, comm rows/device, and modeled efficiency.
Results go to BASELINE.md + NOTES_r5.md (VERDICT r4 item 1).

Usage: python scripts/bench_scaling_model.py [--devices 2 8 64 256]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[2, 8, 64, 256])
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--dataset", default="reddit")
    ap.add_argument("--ns-per-edge", type=float, default=5.24,
                    help="measured per-padded-edge walk cost, ns "
                         "(BENCH_r04 reddit stand-in)")
    ap.add_argument("--row-bytes", type=float, default=2 * 128 * 4,
                    help="bytes exchanged per source row per layer "
                         "(k+v, dim 128 fp32)")
    ap.add_argument("--ici-gbps", type=float, default=90.0,
                    help="assumed per-device ICI bandwidth, GB/s")
    ap.add_argument("--store-result", default=None)
    args = ap.parse_args()

    from dfgnn_tpu.data.datasets import load_full_graph
    from dfgnn_tpu.graph import Graph
    from dfgnn_tpu.parallel.partition import partition_graph

    ds = load_full_graph(args.dataset, "data", scale=args.scale)
    g = Graph.from_coo(ds.rows, ds.cols, ds.n_nodes)
    e = g.n_edges
    print(f"graph: {args.dataset} n={g.n_nodes} e={e}")
    # single-chip anchor: P=1 partition layout (same bucket scheme)
    pg1 = partition_graph(g, 1)
    pad1 = pg1.padded_edges / e
    t1 = pg1.padded_edges * args.ns_per_edge * 1e-9
    print(f"P=1 anchor: pad={pad1:.3f} t_model={t1 * 1e3:.1f} ms")
    del pg1

    bw = args.ici_gbps * 1e9
    rows_out = []
    print(f"{'P':>4} {'bal':>5} {'build_s':>8} {'pad':>6} {'eff_pad':>8} "
          f"{'comm_rows':>10} {'t_comp_ms':>9} {'t_comm_ms':>9} "
          f"{'eff_ser':>7} {'eff_ovl':>7}")
    for balance in (False, True):
        for P in args.devices:
            t0 = time.perf_counter()
            pg = partition_graph(g, P, balance=balance)
            dt = time.perf_counter() - t0
            pad = pg.padded_edges / e
            t_comp = pg.padded_edges / P * args.ns_per_edge * 1e-9
            comm_rows = pg.comm_rows_per_device()
            t_comm = comm_rows * args.row_bytes / bw
            eff_pad = t1 / (P * t_comp)   # padding-only efficiency
            # serial (no overlap) and full-overlap bounds; XLA overlaps
            # the all-gather with the local bucket walk, so the real
            # point lies between them (closer to eff_ovl)
            eff_ser = t1 / (P * (t_comp + t_comm))
            eff_ovl = t1 / (P * max(t_comp, t_comm))
            print(f"{P:>4} {str(balance):>5} {dt:>8.2f} {pad:>6.3f} "
                  f"{eff_pad:>8.3f} {comm_rows:>10} {t_comp * 1e3:>9.2f} "
                  f"{t_comm * 1e3:>9.2f} {eff_ser:>7.3f} {eff_ovl:>7.3f}",
                  flush=True)
            rows_out.append(dict(
                P=P, balance=balance, build_s=round(dt, 3),
                pad=round(pad, 4), eff_pad=round(eff_pad, 4),
                comm_rows=int(comm_rows),
                t_comp_ms=round(t_comp * 1e3, 3),
                t_comm_ms=round(t_comm * 1e3, 3),
                eff_ser=round(eff_ser, 4), eff_ovl=round(eff_ovl, 4)))
            del pg
    if args.store_result:
        with open(args.store_result, "w") as f:
            json.dump(dict(
                dataset=args.dataset, n=g.n_nodes, e=e,
                ns_per_edge=args.ns_per_edge, row_bytes=args.row_bytes,
                ici_gbps=args.ici_gbps, pad1=round(pad1, 4), rows=rows_out,
            ), f, indent=1)
        print(f"stored {args.store_result}")


if __name__ == "__main__":
    main()
