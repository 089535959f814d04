#!/usr/bin/env python
"""Batched-graph kernel benchmark with correctness cross-checks.

Parity: ``DFGNN/script/test/test_batch_graph.py`` — per-format timing of the
attention conv over collated batches, fused-vs-oracle allclose on early
batches, ``--format all`` sweep.

Usage:
    python scripts/test_batch_graph.py --dataset PATTERN --batch-size 1024 \
        --dim 128 --conv gt --format all
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from dfgnn_tpu.data.collate import batch_iterator
    from dfgnn_tpu.data.datasets import load_batched
    from dfgnn_tpu.models import Model
    from dfgnn_tpu.utils.benchmark import benchmark_chained, check_correct
    from dfgnn_tpu.utils.config import build_parser, parse_args, resolve_format
    from dfgnn_tpu.utils.profiling import profile_region

    args = parse_args(build_parser(__doc__), argv)
    formats = (
        ["reference", "dense", "flash"]
        if args.format == "all"
        else [resolve_format(args.format)]
    )

    ds = load_batched(args.dataset, args.data_dir, n_graphs=args.batch_size * 2)
    print(f"dataset {args.dataset}: {len(ds)} graphs, task={ds.task}")

    results = {}
    for fmt in formats:
        if fmt in ("bucket", "dist"):
            print(f"skip {fmt}: full-graph strategy")
            continue
        # inproj + conv on REAL dataset features (reference workload shape:
        # Model, DFGNN/layers/model.py:29-40); params initialised once per
        # format, outside the timed batch loop
        model = Model(dataset_name=args.dataset, conv=args.conv,
                      hidden_size=args.dim, num_heads=args.heads)
        params = None
        times = []
        for ep, (batch, feats, labels, lmask) in enumerate(
            batch_iterator(ds, args.batch_size)
        ):
            batch = batch.device_put()
            x = jnp.asarray(feats)
            if params is None:
                params = model.init(jax.random.key(0), batch, x, impl=fmt)
            if ep == 0 and args.profile:
                with profile_region(f"batch_{args.dataset}_{fmt}"):
                    jax.block_until_ready(
                        model.apply(params, batch, x, impl=fmt))
            # time at the PARITY precision (fp32-equivalent matmuls): the
            # correctness bar below runs at HIGHEST, and timing a format
            # at default precision (single-pass bf16 on TPU) while
            # checking it at HIGHEST would let a format win on silently
            # degraded numerics.  (The flash kernel already pins HIGHEST
            # for fp32 inputs internally; this levels dense/reference.)
            with jax.default_matmul_precision("highest"):
                ms = benchmark_chained(
                    lambda x: model.apply(params, batch, x, impl=fmt),
                    x, iters=30,
                )
            eps = batch.n_edges / (ms / 1e3)
            times.append((ms, eps))
            if ep < 1 and fmt != "reference":
                # correctness vs oracle on the block-diagonal graph, at
                # HIGHEST matmul precision on both sides (TPU matmuls
                # default to bf16 passes; the parity bar is fp32)
                g = batch.to_graph()
                with jax.default_matmul_precision("highest"):
                    want = model.apply(params, g, x, impl="reference")
                    got = model.apply(params, batch, x, impl=fmt)
                ok = check_correct(np.asarray(got), np.asarray(want))
                print(f"  [{fmt}] correctness vs oracle: {'OK' if ok else 'FAIL'}")
            if ep >= 1:
                break
        mean_ms = float(np.mean([t for t, _ in times]))
        mean_eps = float(np.mean([e for _, e in times]))
        results[fmt] = {"ms": mean_ms, "edges_per_s": mean_eps}
        print(f"  [{fmt}] {mean_ms:.3f} ms/batch   {mean_eps:.3e} edges/s")

    if args.store_result:
        os.makedirs("results", exist_ok=True)
        out = f"results/batch_{args.dataset}_{args.conv}_{args.dim}.json"
        with open(out, "w") as f:
            json.dump({"args": vars(args), "results": results}, f, indent=2)
        print("stored", out)


if __name__ == "__main__":
    main()
