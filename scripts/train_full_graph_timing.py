#!/usr/bin/env python
"""Full-graph training timing decomposition (fw / fw+bw / full epoch).

Parity: ``DFGNN/script/train/train_full_graph_timing.py`` — 8-layer GT
stack on one full graph; times forward-only, forward+backward, and the full
epoch (incl. Adam update) for fused and unfused paths, derives
backward/update by subtraction, prints a tabulate table (:185-201 there).

Usage:
    python scripts/train_full_graph_timing.py --dataset cora --dim 64 \
        --n-layers 8 --epochs 5
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax
    from tabulate import tabulate

    from dfgnn_tpu.data.datasets import load_full_graph
    from dfgnn_tpu.formats import build_buckets
    from dfgnn_tpu.graph import Graph
    from dfgnn_tpu.models import FullGraphNet
    from dfgnn_tpu.utils.config import build_parser, parse_args

    p = build_parser(__doc__)
    p.add_argument(
        "--remat", action="store_true",
        help="jax.checkpoint each conv layer (FullGraphNet(remat=True)): "
             "required for deep stacks on super-node graphs — without it "
             "XLA keeps several layers' gathered edge buffers live at "
             "once (8-layer reddit-standin wanted 49 GB at compile)")
    args = parse_args(p, argv)
    ds = load_full_graph(args.dataset, args.data_dir)
    g = Graph.from_coo(ds.rows, ds.cols, ds.n_nodes)
    g_oracle = g
    ORACLE_EDGE_CAP = 4_000_000
    if g.n_edges > ORACLE_EDGE_CAP:
        # the unfused oracle's O(E*dim) gathered temporaries exceed HBM
        # at super-node scale; its rows run on a subsample and compare by
        # rate (test_full_graph.py methodology)
        e = g.n_edges
        sub = np.random.default_rng(0).choice(e, ORACLE_EDGE_CAP,
                                              replace=False)
        g_oracle = Graph.from_coo(np.asarray(g.rows)[:e][sub],
                                  np.asarray(g.cols)[:e][sub], g.n_nodes)
        print(f"unfused(oracle) rows use a {ORACLE_EDGE_CAP}-edge "
              f"subsample ({e} edges exceed the oracle's HBM budget)")

    t0 = time.time()
    # preprocessing done once (ref :57); transpose enables the fused
    # custom backward (ref preprocess_Hyper_fw_bw analog)
    bg = build_buckets(g, with_transpose=True)
    prep_s = time.time() - t0
    bg = bg.device_put()
    g = g.device_put()

    x = jnp.asarray(ds.features[:, : args.dim].astype(np.float32))
    if x.shape[1] < args.dim:
        x = jnp.pad(x, [(0, 0), (0, args.dim - x.shape[1])])
    y = jnp.asarray(ds.labels)

    model = FullGraphNet(
        conv=args.conv, num_classes=ds.num_classes, hidden_size=args.dim,
        num_layers=args.n_layers, num_heads=args.heads, remat=args.remat,
    )
    params = model.init(jax.random.key(0), bg, x)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    rows = []
    for name, layout in [("fused(bucket)", bg), ("unfused(oracle)", g_oracle)]:
        # layout and features ride as jit ARGUMENTS: closed-over device
        # arrays are embedded as compile-request constants, which blows
        # the remote-compile size limit at full-graph scale
        def loss_fn(p, layout, x):
            lp = model.apply(p, layout, x)
            return -jnp.mean(jnp.take_along_axis(lp, y[:, None], axis=1))

        fw = jax.jit(loss_fn)
        # return the grads too — returning only [0] lets XLA dead-code-
        # eliminate the whole backward pass
        fwbw = jax.jit(
            lambda p, layout, x: jax.value_and_grad(loss_fn)(p, layout, x))

        def epoch_fn(p, o, layout, x):
            l, grads = jax.value_and_grad(loss_fn)(p, layout, x)
            up, o = opt.update(grads, o)
            return optax.apply_updates(p, up), o, l

        ep = jax.jit(epoch_fn)

        def timed(fn, *a):
            jax.block_until_ready(fn(*a))  # compile + warmup
            t0 = time.time()
            for _ in range(args.epochs):
                out = fn(*a)
            jax.block_until_ready(out)
            return (time.time() - t0) / args.epochs * 1e3

        t_fw = timed(fw, params, layout, x)
        t_fwbw = timed(fwbw, params, layout, x)
        t_ep = timed(ep, params, opt_state, layout, x)
        rows.append(
            [name, f"{t_fw:.2f}", f"{t_fwbw - t_fw:.2f}", f"{t_ep - t_fwbw:.2f}",
             f"{t_ep:.2f}"]
        )

    print(f"preprocess: {prep_s*1e3:.1f} ms (once)")
    print(tabulate(
        rows, headers=["path", "forward ms", "backward ms", "update ms", "epoch ms"],
        tablefmt="github",
    ))


if __name__ == "__main__":
    main()
