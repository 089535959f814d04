#!/usr/bin/env python
"""Mini-batch training on a large full graph via neighborhood sampling.

New capability (BASELINE.json scope; no reference counterpart): GraphSAGE-
style layered sampling feeds fixed-fanout sampled blocks to the fused
bucketed attention path; one jit trace serves every re-sampled batch.

Usage:
    python scripts/train_sampled.py --dataset arxiv --dim 64 --epochs 3 \
        --batch-size 1024
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
    from flax import linen as nn

    from dfgnn_tpu.data.datasets import load_full_graph
    from dfgnn_tpu.data.sampling import NeighborSampler
    from dfgnn_tpu.graph import Graph, device_put
    from dfgnn_tpu.models.conv import GTConv
    from dfgnn_tpu.utils.config import build_parser, parse_args

    args = parse_args(build_parser(__doc__), argv)
    ds = load_full_graph(args.dataset, args.data_dir)
    g = Graph.from_coo(ds.rows, ds.cols, ds.n_nodes)
    sampler = NeighborSampler(g)
    n = ds.n_nodes
    fanouts = [8, 8]
    # fixed per-layer seed caps -> one jit trace for every batch
    pad_to = [args.batch_size, args.batch_size * (fanouts[0] + 1)]

    x_full = jnp.asarray(ds.features[:, : args.dim].astype(np.float32))
    if x_full.shape[1] < args.dim:
        x_full = jnp.pad(x_full, [(0, 0), (0, args.dim - x_full.shape[1])])
    y_full = np.asarray(ds.labels)
    train_ids = np.nonzero(np.asarray(ds.train_mask))[0]

    class SampledNet(nn.Module):
        """2-layer GT over sampled blocks: each layer aggregates the
        previous layer's full-node features into its block's seed rows,
        scattered back to a full-size buffer."""

        hidden: int
        n_classes: int

        @nn.compact
        def __call__(self, blocks, x):
            h = nn.Dense(self.hidden)(x)
            for li, blk in enumerate(reversed(blocks)):
                out_rows = GTConv(self.hidden, name=f"conv_{li}")(blk, h)
                buf = jnp.zeros((n + 1, self.hidden), h.dtype)
                h = buf.at[blk.seeds].set(out_rows, mode="drop")[:n]
            return nn.Dense(self.n_classes)(h)

    model = SampledNet(hidden=args.dim, n_classes=ds.num_classes)
    rng = np.random.default_rng(0)
    seeds0 = train_ids[: args.batch_size]
    blocks0 = [b.device_put() for b in sampler.sample(seeds0, fanouts, seed=0, pad_to=pad_to)]
    params = model.init(jax.random.key(0), blocks0, x_full)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, blocks, x, y, seed_ids):
        def loss_fn(p):
            logits = model.apply(p, blocks, x)
            sel = jnp.take(logits, seed_ids, axis=0, mode="clip")
            yb = jnp.take(y, seed_ids, axis=0, mode="clip")
            return optax.softmax_cross_entropy_with_integer_labels(sel, yb).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    y_dev = jnp.asarray(y_full)
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        order = rng.permutation(train_ids)
        for s in range(0, len(order) - args.batch_size + 1, args.batch_size):
            seeds = order[s : s + args.batch_size]
            blocks = [
                b.device_put()
                for b in sampler.sample(seeds, fanouts, seed=epoch * 7919 + s,
                                        pad_to=pad_to)
            ]
            # blocks only match trace shapes if seed counts match; frontier
            # sizes vary -> pad seeds arrays are already padded per 128
            sid = jnp.asarray(
                np.pad(seeds, (0, blocks[0].seeds.shape[0] - len(seeds)),
                       constant_values=n)
            )
            params, opt_state, loss = step(
                params, opt_state, blocks, x_full, y_dev, sid
            )
            losses.append(float(loss))
        print(f"epoch {epoch}: loss={np.mean(losses):.4f} "
              f"({len(losses)} steps, {time.time()-t0:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
