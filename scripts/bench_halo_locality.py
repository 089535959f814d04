#!/usr/bin/env python
"""Halo-exchange payoff on a community-structured graph (VERDICT r4
weak #3 / item 6): show the O(halo) boundary exchange beating the
all-gather when the partition has locality, and that ``reorder=`` creates
that locality even from shuffled node ids.

Host-side numpy only (partition-plan statistics — no TPU needed; the
exchange itself is bitwise-tested in tests/test_partition.py).  For each
P in {8, 64} builds an SBM-style community graph at reddit scale, SHUFFLES
the node ids (so raw contiguous blocking sees no locality), then
partitions with halo=True x reorder in {none, bfs, lpa} and reports:

  - max_halo / n_local   (1.0 == all-of-peer == all-gather equivalent)
  - comm rows/device and modeled bytes/layer vs the all-gather baseline

Usage: python scripts/bench_halo_locality.py [--n 232965] [--communities 64]
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
    ap.add_argument("--n", type=int, default=232965)
    ap.add_argument("--avg-deg", type=float, default=30.0)
    ap.add_argument("--communities", type=int, default=64)
    ap.add_argument("--intra", type=float, default=0.95)
    ap.add_argument("--devices", type=int, nargs="+", default=[8, 64])
    ap.add_argument("--row-bytes", type=float, default=2 * 128 * 4)
    ap.add_argument("--store-result", default=None)
    args = ap.parse_args()

    from dfgnn_tpu.data.synthetic import community_graph
    from dfgnn_tpu.graph import Graph
    from dfgnn_tpu.parallel.partition import partition_graph

    rng = np.random.default_rng(0)
    rows, cols = community_graph(rng, args.n, args.communities,
                                 avg_deg=args.avg_deg, intra_frac=args.intra)
    # shuffle ids: destroys the generator's contiguous-community layout,
    # so any locality must be RECOVERED by reorder=
    shuf = rng.permutation(args.n)
    rows, cols = shuf[rows], shuf[cols]
    g = Graph.from_coo(rows.astype(np.int32), cols.astype(np.int32), args.n)
    print(f"community graph: n={g.n_nodes} e={g.n_edges} "
          f"({args.communities} communities, intra={args.intra}, shuffled)")

    out_rows = []
    print(f"{'P':>4} {'reorder':>8} {'build_s':>8} {'halo/n_loc':>10} "
          f"{'comm_rows':>10} {'ideal_rows':>10} {'MB/layer':>9} "
          f"{'vs allgather':>12}")
    for P in args.devices:
        base_rows = None
        for reorder in (None, "bfs", "lpa"):
            t0 = time.perf_counter()
            pg = partition_graph(g, P, halo=True, reorder=reorder)
            dt = time.perf_counter() - t0
            comm = pg.comm_rows_per_device()
            frac = pg.halo.max_halo / pg.n_local
            mb = comm * args.row_bytes / 1e6
            # ideal = what a variable-length exchange would move (mean
            # ACTUAL per-pair need, vs the static all_to_all's shared
            # max_halo harmonization) — the gap is the static-shape tax
            sl = np.asarray(pg.halo.send_local)
            need = (sl != 0).sum(axis=2) + 1  # rank-0 row is index 0 too
            np.fill_diagonal(need, 0)
            ideal = int(need.sum() / P)
            if reorder is None:
                # all-gather comm volume == (P-1) * n_local rows; the
                # no-reorder halo on a shuffled graph approaches it
                base_rows = (P - 1) * pg.n_local
            ratio = comm / base_rows
            print(f"{P:>4} {str(reorder):>8} {dt:>8.2f} {frac:>10.3f} "
                  f"{comm:>10} {ideal:>10} {mb:>9.1f} {ratio:>12.3f}",
                  flush=True)
            out_rows.append(dict(P=P, reorder=reorder or "none",
                                 build_s=round(dt, 2),
                                 halo_frac=round(frac, 4), comm_rows=int(comm),
                                 ideal_rows=ideal,
                                 mb_per_layer=round(mb, 2),
                                 vs_allgather=round(ratio, 4)))
            del pg
    if args.store_result:
        with open(args.store_result, "w") as f:
            json.dump(dict(n=g.n_nodes, e=g.n_edges,
                           communities=args.communities, intra=args.intra,
                           row_bytes=args.row_bytes, rows=out_rows), f,
                      indent=1)
        print("stored", args.store_result)


if __name__ == "__main__":
    main()
