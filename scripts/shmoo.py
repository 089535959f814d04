#!/usr/bin/env python
"""Shmoo sweeps: feature dim and batch size.

Parity: the reference's fig4/fig5 experiments
(``bash/experiment/fig4_shmoo_feature_dim.sh`` — dims {16..256};
``fig5_shmoo_batch_size.sh`` — batch sizes {64..2048}) for the fused GT
conv on a PATTERN-shaped batched workload.

Usage:
    python scripts/shmoo.py [--conv gt] [--store-result]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from dfgnn_tpu.data.synthetic import pattern_like_batch
    from dfgnn_tpu.graph import DenseBatch
    from dfgnn_tpu.models import make_conv
    from dfgnn_tpu.utils.benchmark import benchmark_chained
    from dfgnn_tpu.utils.config import build_parser, parse_args

    args = parse_args(build_parser(__doc__), argv)
    rng = np.random.default_rng(0)
    results = {"dim": {}, "batch_size": {}}

    def run(bs, dim):
        graphs = [(r, c, n) for r, c, n, _ in pattern_like_batch(rng, bs)]
        batch = DenseBatch.from_graph_list(graphs, np_pad=128).device_put()
        x = jnp.asarray(
            rng.standard_normal((batch.n_graphs * batch.np_pad, dim)).astype(np.float32)
        )
        layer = make_conv(args.conv, out_size=dim, num_heads=args.heads)
        params = layer.init(jax.random.key(0), batch, x)
        ms = benchmark_chained(lambda x: layer.apply(params, batch, x), x, iters=20)
        return ms, batch.n_edges / (ms / 1e3)

    print("== feature-dim shmoo (bs=256) ==")
    for dim in [16, 32, 64, 128, 256]:
        ms, eps = run(256, dim)
        results["dim"][dim] = {"ms": ms, "edges_per_s": eps}
        print(f"dim={dim:4d}: {ms:7.3f} ms  {eps:.3e} edges/s", flush=True)

    print("== batch-size shmoo (dim=128) ==")
    for bs in [64, 128, 256, 512, 1024, 2048]:
        ms, eps = run(bs, 128)
        results["batch_size"][bs] = {"ms": ms, "edges_per_s": eps}
        print(f"bs={bs:5d}: {ms:7.3f} ms  {eps:.3e} edges/s", flush=True)

    if args.store_result:
        os.makedirs("results", exist_ok=True)
        out = f"results/shmoo_{args.conv}.json"
        with open(out, "w") as f:
            json.dump({"args": vars(args), "results": results}, f, indent=2)
        print("stored", out)


if __name__ == "__main__":
    main()
