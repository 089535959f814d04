#!/usr/bin/env python
"""GT conv benchmark over a GraphWorld-style SBM avg-degree sweep.

Parity: ``DFGNN/script/test/test_gt_graphworld.py`` — throughput of the
fused GT conv on synthetic SBM graphs as average degree varies
(``bash/run_graph_world.sh:30-36`` sweeps pickled GraphWorld graphs; here
the SBM generator produces them directly).

Usage:
    python scripts/test_gt_graphworld.py --dim 64 [--store-result]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from dfgnn_tpu.data.synthetic import sbm_graph
    from dfgnn_tpu.formats import build_buckets
    from dfgnn_tpu.graph import Graph
    from dfgnn_tpu.models import make_conv
    from dfgnn_tpu.utils.benchmark import benchmark_chained, check_correct
    from dfgnn_tpu.utils.config import build_parser, parse_args

    args = parse_args(build_parser(__doc__), argv)
    rng = np.random.default_rng(0)
    n = 4096
    layer = make_conv(args.conv, out_size=args.dim, num_heads=args.heads)

    results = {}
    for avg_deg in [2, 4, 8, 16, 32, 64]:
        rows, cols, _ = sbm_graph(rng, n, avg_deg=avg_deg)
        g = Graph.from_coo(rows, cols, n)
        bg = build_buckets(g).device_put()
        x = jnp.asarray(rng.standard_normal((n, args.dim)).astype(np.float32))
        params = layer.init(jax.random.key(0), g, x, impl="reference")
        got = layer.apply(params, bg, x)
        want = layer.apply(params, g, x, impl="reference")
        ok = check_correct(np.asarray(got), np.asarray(want))
        ms = benchmark_chained(lambda x: layer.apply(params, bg, x), x, iters=10)
        eps = g.n_edges / (ms / 1e3)
        results[avg_deg] = {"ms": float(ms), "edges_per_s": float(eps), "ok": ok}
        print(f"avg_deg={avg_deg:3d}: {ms:7.3f} ms  {eps:.3e} edges/s  "
              f"correct={'OK' if ok else 'FAIL'}")

    if args.store_result:
        os.makedirs("results", exist_ok=True)
        out = f"results/graphworld_{args.conv}_{args.dim}.json"
        with open(out, "w") as f:
            json.dump({"args": vars(args), "results": results}, f, indent=2)
        print("stored", out)


if __name__ == "__main__":
    main()
