#!/usr/bin/env python
"""Shmoo sweeps: feature dim and batch size, per implementation.

Parity: the reference's fig4/fig5 experiments
(``bash/experiment/fig4_shmoo_feature_dim.sh`` — dims {16..256};
``fig5_shmoo_batch_size.sh`` — batch sizes {64..2048}) for the fused
conv families on a PATTERN-shaped batched workload.

Beyond the reference's single-impl sweep, each point times EVERY bf16
implementation (flash = decomposed projections + masked flash Pallas
kernel; dense = XLA's dense masked formulation; flash_fused = whole
layer in one Pallas kernel, gt/gat only) so the flash/dense/fused
crossovers are visible and the bf16 auto defaults (models/conv.py,
chosen at the dim=128/bs=1024 headline point in r4) can be validated
across the grid.  An fp32 flash row rides along as the precision
baseline.

Usage:
    python scripts/shmoo.py [--conv gt|gat|agnn|all] [--store-result]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

IMPLS = {
    "gt": ("flash", "dense", "flash_fused"),
    "gat": ("flash", "dense", "flash_fused"),
    "agnn": ("flash", "dense"),
}
# the bf16 auto routing encoded in models/conv.py (measured winners at
# the r4 headline point) — used to flag default-vs-winner disagreements
AUTO_DEFAULT = {"gt": "dense", "gat": "flash_fused", "agnn": "dense"}


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from dfgnn_tpu.data.synthetic import pattern_like_batch
    from dfgnn_tpu.graph import DenseBatch
    from dfgnn_tpu.models import make_conv
    from dfgnn_tpu.utils.benchmark import benchmark_chained
    from dfgnn_tpu.utils.config import build_parser, parse_args

    args = parse_args(build_parser(__doc__), argv)
    convs = ["gt", "gat", "agnn"] if args.conv in ("all",) else [args.conv]
    rng = np.random.default_rng(0)

    batches = {}

    def get_batch(bs):
        if bs not in batches:
            graphs = [(r, c, n) for r, c, n, _ in pattern_like_batch(rng, bs)]
            batches[bs] = DenseBatch.from_graph_list(
                graphs, np_pad=128).device_put()
        return batches[bs]

    def run_point(conv, bs, dim):
        batch = get_batch(bs)
        x = jnp.asarray(rng.standard_normal(
            (batch.n_graphs * batch.np_pad, dim)).astype(np.float32))
        row = {}
        layer16 = make_conv(conv, out_size=dim, num_heads=args.heads,
                            dtype=jnp.bfloat16)
        p16 = layer16.init(jax.random.key(0), batch, x)
        for impl in IMPLS[conv]:
            ms = benchmark_chained(
                lambda x, impl=impl: layer16.apply(p16, batch, x, impl=impl),
                x, iters=30)
            row[impl] = round(float(ms), 4)
        layer32 = make_conv(conv, out_size=dim, num_heads=args.heads)
        p32 = layer32.init(jax.random.key(0), batch, x)
        row["fp32_flash"] = round(float(benchmark_chained(
            lambda x: layer32.apply(p32, batch, x, impl="flash"), x,
            iters=30)), 4)
        bf16 = {k: v for k, v in row.items() if k != "fp32_flash"}
        row["winner"] = min(bf16, key=bf16.get)
        row["default_ok"] = bool(
            bf16[AUTO_DEFAULT[conv]]
            <= min(bf16.values()) * 1.08)  # within jitter of the winner
        row["n_edges"] = batch.n_edges
        return row

    results = {c: {"dim": {}, "batch_size": {}} for c in convs}
    for conv in convs:
        print(f"== {conv}: feature-dim shmoo (bs=256) ==")
        for dim in [16, 32, 64, 128, 256]:
            row = run_point(conv, 256, dim)
            results[conv]["dim"][dim] = row
            print(f"  dim={dim:4d}: " + "  ".join(
                f"{k}={row[k]:.3f}" for k in (*IMPLS[conv], "fp32_flash"))
                + f"  -> {row['winner']}"
                + ("" if row["default_ok"] else "  [DEFAULT MISMATCH]"),
                flush=True)
        print(f"== {conv}: batch-size shmoo (dim=128) ==")
        for bs in [64, 128, 256, 512, 1024, 2048]:
            row = run_point(conv, bs, 128)
            results[conv]["batch_size"][bs] = row
            print(f"  bs={bs:5d}: " + "  ".join(
                f"{k}={row[k]:.3f}" for k in (*IMPLS[conv], "fp32_flash"))
                + f"  -> {row['winner']}"
                + ("" if row["default_ok"] else "  [DEFAULT MISMATCH]"),
                flush=True)

    if args.store_result:
        os.makedirs("results", exist_ok=True)
        out = f"results/shmoo_{args.conv}.json"
        with open(out, "w") as f:
            json.dump({"args": vars(args), "auto_default": AUTO_DEFAULT,
                       "results": results}, f, indent=2)
        print("stored", out)


if __name__ == "__main__":
    main()
