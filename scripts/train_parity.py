#!/usr/bin/env python
"""Fused-vs-unfused accuracy parity (reference protocol:
``DFGNN/script/train/train_gtconv.py:225-227`` trains both paths
sequentially and compares the end metric).

Runs the batched (PATTERN-like SBM, flash kernel) and full-graph (SBM or a
real dataset when local files exist, bucket path) parity configurations
with identical init/data/optimizer, and prints both metrics + gap.

Usage:
    python scripts/train_parity.py [--conv gt|gat|agnn] [--steps 200]
        [--dataset cora]   # uses real data when present under --data-dir
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--conv", default="gt")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dataset", default=None,
                    help="full-graph dataset name (real data used if found)")
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--store-result", action="store_true")
    args = ap.parse_args(argv)

    from dfgnn_tpu.train.parity import run_parity_batched, run_parity_full

    ds = None
    if args.dataset:
        from dfgnn_tpu.data.datasets import load_full_graph

        ds = load_full_graph(args.dataset, args.data_dir)

    results = []
    for fn, kw in (
        (run_parity_batched, {}),
        (run_parity_full, {"dataset": ds}),
    ):
        r = fn(seed=args.seed, hidden=args.hidden, layers=args.layers,
               steps=args.steps, conv=args.conv, **kw)
        results.append(r)
        print(f"[{r['task']}] fused={r['acc_fused']:.4f} "
              f"unfused={r['acc_unfused']:.4f} gap={r['gap']:.4f} "
              f"(majority baseline {r['majority_baseline']:.3f})")

    worst = max(r["gap"] for r in results)
    print(f"parity: worst gap = {worst:.4f} "
          f"({'OK' if worst < 0.02 else 'CHECK'} at the 0.02 bar)")
    if args.store_result:
        os.makedirs("results", exist_ok=True)
        with open(f"results/parity_{args.conv}.json", "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
