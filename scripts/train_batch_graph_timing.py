#!/usr/bin/env python
"""Batched-graph training timing split: preprocess / forward / backward.

Parity: ``DFGNN/script/train/train_batch_graph_timing.py`` — per-epoch time
decomposed into host-side batch preprocessing (collation), forward, and
forward+backward (backward derived by subtraction), tabulate output
(:146-269 there), with a strict fused-vs-unfused check on the first batch
(:20-29: atol 0.01 over all nodes).

Usage:
    python scripts/train_batch_graph_timing.py --dataset PATTERN \
        --batch-size 256 --dim 64 --n-layers 4
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

    from dfgnn_tpu.data.collate import batch_iterator
    from dfgnn_tpu.data.datasets import load_batched
    from dfgnn_tpu.models import GTModel
    from dfgnn_tpu.train import make_loss_fn
    from dfgnn_tpu.utils.config import build_parser, parse_args

    args = parse_args(build_parser(__doc__), argv)
    ds = load_batched(args.dataset, args.data_dir, n_graphs=args.batch_size * 4)
    node_level = ds.task == "node_classification"
    if node_level:
        # node-level head (PATTERN/CLUSTER): inproj -> conv stack -> node
        # classifier, trained on the real per-node labels + mask
        from flax import linen as nn

        from dfgnn_tpu.models import choose_inproj
        from dfgnn_tpu.models.conv import GTConv

        class NodeNet(nn.Module):
            @nn.compact
            def __call__(self, g, x):
                h = choose_inproj(args.dataset, args.dim)(x)
                for i in range(args.n_layers):
                    h = GTConv(args.dim, args.heads, name=f"layer_{i}")(g, h)
                return nn.log_softmax(nn.Dense(ds.num_classes)(h))

        model = NodeNet()
        loss_fn = make_loss_fn(model, "node_classification", ds.num_classes)
    else:
        model = GTModel(
            args.dataset,
            out_size=ds.num_classes,
            hidden_size=args.dim,
            num_layers=args.n_layers,
            num_heads=args.heads,
        )
        loss_fn = make_loss_fn(model, ds.task, ds.num_classes)

    # host-side preprocess timing (collation, per batch, like the ref's
    # per-batch format conversion accounting)
    t0 = time.time()
    batches = list(batch_iterator(ds, args.batch_size, np_pad=128))
    prep_ms = (time.time() - t0) / max(len(batches), 1) * 1e3
    batches = [
        (b.replace(n_edges=0, n_nodes=0).device_put(), x, y, m)
        for b, x, y, m in batches
    ]

    batch0, x0, y0, m0 = batches[0]
    x0j = jnp.asarray(x0)
    params = model.init(jax.random.key(0), batch0, x0j)

    # strict first-batch correctness: fused vs oracle conv outputs,
    # atol=0.01 over ALL nodes (ref train_batch_graph_timing.py:20-29 checks
    # node-level activations)
    from dfgnn_tpu.models import make_conv

    conv = make_conv("gt", out_size=args.dim, num_heads=args.heads)
    xf = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (batch0.n_graphs * batch0.np_pad, args.dim)
        ).astype(np.float32)
    )
    cparams = conv.init(jax.random.key(1), batch0, xf)
    g0 = batch0.to_graph()
    out_f = conv.apply(cparams, batch0, xf)
    out_r = conv.apply(cparams, g0, xf, impl="reference")
    if not np.allclose(np.asarray(out_f), np.asarray(out_r), atol=0.01):
        print("STRICT CHECK FAILED (atol=0.01)")
        sys.exit(1)
    print("strict fused-vs-unfused check: OK")

    fw = jax.jit(lambda p, b, x, y, m: loss_fn(p, b, x, y, m))
    # return the grads too — returning only value_and_grad(...)[0] lets
    # XLA dead-code-eliminate the whole backward pass (measured: derived
    # backward ~0 or negative)
    fwbw = jax.jit(
        lambda p, b, x, y, m: jax.value_and_grad(loss_fn)(p, b, x, y, m))

    # device-resident batches OUTSIDE the timed region (host->device
    # conversion is the "preprocess" column, already measured above), and
    # several pipelined passes over the loader so per-dispatch tunnel
    # latency amortizes — with only len(batches) dispatches the derived
    # backward column was measurement noise (could even go negative)
    dev_batches = [
        (b, jnp.asarray(x), jnp.asarray(y),
         jnp.asarray(m, dtype=jnp.float32)) for b, x, y, m in batches
    ]

    def timed(fn, reps=5):
        out = None
        for b, x, y, m in dev_batches[:1]:
            out = fn(params, b, x, y, m)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            for b, x, y, m in dev_batches:
                out = fn(params, b, x, y, m)
        jax.block_until_ready(out)
        return (time.time() - t0) / (reps * len(dev_batches)) * 1e3

    t_fw = timed(fw)
    t_fwbw = timed(fwbw)
    print(
        tabulate(
            [[args.dataset, f"{prep_ms:.2f}", f"{t_fw:.2f}",
              f"{t_fwbw - t_fw:.2f}", f"{t_fwbw:.2f}"]],
            headers=["dataset", "preprocess ms", "forward ms", "backward ms",
                     "fw+bw ms"],
            tablefmt="github",
        )
    )


if __name__ == "__main__":
    main()
