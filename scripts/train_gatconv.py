#!/usr/bin/env python
"""Full-graph GAT training: accuracy + timing + peak device memory.

Parity: ``DFGNN/script/train/train_gatconv.py`` (the dgNN-lineage GAT
trainer — broken in the reference snapshot but documenting the intended
capability, SURVEY.md P11): multi-layer GAT on one full graph, Adam,
train/val/test masks, reports per-epoch train time, inference time, test
accuracy, and peak device memory (GPUtil analog ->
``device.memory_stats()``).

Usage:
    python scripts/train_gatconv.py --dataset cora --dim 64 --heads 4 \
        --n-layers 2 --epochs 20 --lr 1e-2
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from dfgnn_tpu.data.datasets import load_full_graph
    from dfgnn_tpu.formats import build_buckets
    from dfgnn_tpu.graph import Graph
    from dfgnn_tpu.models import GATNet
    from dfgnn_tpu.train import TrainState, make_loss_fn
    from dfgnn_tpu.utils.config import build_parser, parse_args

    args = parse_args(build_parser(__doc__), argv)
    ds = load_full_graph(args.dataset, args.data_dir)
    g = Graph.from_coo(ds.rows, ds.cols, ds.n_nodes)
    bg = build_buckets(g, with_transpose=True).device_put()

    x = jnp.asarray(ds.features.astype(np.float32))
    y = jnp.asarray(ds.labels)
    train_mask = jnp.asarray(ds.train_mask)
    test_mask = np.asarray(ds.test_mask)

    model = GATNet(
        num_classes=ds.num_classes, hidden_size=args.dim,
        num_layers=args.n_layers, num_heads=args.heads,
    )
    params = model.init(jax.random.key(0), bg, x)
    state = TrainState.create(model, params, lr=args.lr)
    loss_fn = make_loss_fn(model, "node_classification", ds.num_classes)
    import optax

    @jax.jit
    def step(params, opt_state, x, y, m):
        loss, grads = jax.value_and_grad(loss_fn)(params, bg, x, y, m)
        updates, opt_state = state.opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    infer = jax.jit(lambda p, x: model.apply(p, bg, x))

    params, opt_state = state.params, state.opt_state
    train_times = []
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, x, y, train_mask)
        loss = float(loss)  # value fetch = true device barrier
        train_times.append(time.perf_counter() - t0)
        if epoch % max(1, args.epochs // 5) == 0:
            print(f"epoch {epoch}: loss={loss:.4f} "
                  f"time={train_times[-1]*1e3:.1f}ms", flush=True)

    t0 = time.perf_counter()
    logits = np.asarray(infer(params, x))
    infer_s = time.perf_counter() - t0
    pred = logits.argmax(-1)
    labels = np.asarray(ds.labels)
    acc = float((pred[test_mask] == labels[test_mask]).mean()) if test_mask.any() \
        else float((pred == labels).mean())

    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0)
    print(f"train time/epoch: {np.mean(train_times[1:])*1e3:.1f} ms  "
          f"inference: {infer_s*1e3:.1f} ms")
    print(f"test accuracy: {acc:.4f}")
    print(f"peak device memory: {peak/2**20:.1f} MiB")


if __name__ == "__main__":
    main()
