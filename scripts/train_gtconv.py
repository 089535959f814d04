#!/usr/bin/env python
"""End-to-end fused GT training on a graph-classification dataset.

Parity: ``DFGNN/script/train/train_gtconv.py`` — 8-layer GTModel, Adam +
StepLR, BCE loss, ROC-AUC per epoch, and ``--checkgrad`` comparing fused
vs unfused q/k/v projection-weight gradients on the same batch
(:106-143 there).

Usage:
    python scripts/train_gtconv.py --dataset ogbg-molhiv --dim 64 \
        --batch-size 64 --epochs 3 [--checkgrad]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from dfgnn_tpu.data.collate import batch_iterator
    from dfgnn_tpu.data.datasets import load_batched
    from dfgnn_tpu.models import GTModel
    from dfgnn_tpu.train import (
        TrainState, make_loss_fn, train_step, evaluate_rocauc,
        evaluate_mean_ap,
    )
    from dfgnn_tpu.utils.config import build_parser, parse_args

    args = parse_args(build_parser(__doc__), argv)
    ds = load_batched(args.dataset, args.data_dir, n_graphs=args.batch_size * 8)
    model = GTModel(
        args.dataset, out_size=ds.num_classes, hidden_size=args.dim,
        num_layers=args.n_layers, num_heads=args.heads,
    )

    batches = list(batch_iterator(ds, args.batch_size, np_pad=128))
    # normalise static metadata so every batch shares one jit trace
    batches = [
        (b.replace(n_edges=0, n_nodes=0).device_put(), x, y, m)
        for b, x, y, m in batches
    ]
    batch0, x0, y0, m0 = batches[0]
    x0j = jnp.asarray(x0)
    params = model.init(jax.random.key(0), batch0, x0j)
    loss_fn = make_loss_fn(model, ds.task, ds.num_classes)
    state = TrainState.create(model, params, lr=args.lr, step_lr_every=20)

    if args.checkgrad:
        _checkgrad(model, params, loss_fn, batch0, x0, y0, m0)
        return

    step = jax.jit(
        lambda p, o, b, x, y, m: _step(model, state.opt, loss_fn, b, p, o, x, y, m)
    )
    params, opt_state = state.params, state.opt_state
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        for batch, x, y, m in batches:
            params, opt_state, loss = step(
                params, opt_state, batch, jnp.asarray(x), jnp.asarray(y), jnp.asarray(m)
            )
            losses.append(float(loss))
        # eval ROC-AUC (binary), mean AP (multilabel), or accuracy
        scores, ys, ms = [], [], []
        for batch, x, y, m in batches:
            logits = model.apply(params, batch, jnp.asarray(x))
            scores.append(np.asarray(logits))
            ys.append(y)
            ms.append(m)
        sc, yy, mm = (np.concatenate(a) for a in (scores, ys, ms))
        if ds.num_classes == 1:
            metric = evaluate_rocauc(yy, sc)
        elif ds.task == "graph_classification_multilabel":
            metric = evaluate_mean_ap(yy, sc, mask=mm)
        else:
            metric = float((sc.argmax(-1)[mm.astype(bool)]
                            == yy[mm.astype(bool)]).mean())
        print(
            f"epoch {epoch}: loss={np.mean(losses):.4f} metric={metric:.4f} "
            f"time={time.time()-t0:.2f}s"
        )


def _step(model, opt, loss_fn, batch, params, opt_state, x, y, m):
    import jax
    import optax

    loss, grads = jax.value_and_grad(loss_fn)(params, batch, x, y, m)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


def _checkgrad(model, params, loss_fn, batch, x, y, m):
    """Fused-vs-unfused gradient comparison on one batch (parity:
    ``train_gtconv.py:106-143``)."""
    import jax
    import jax.numpy as jnp

    xj, yj, mj = jnp.asarray(x), jnp.asarray(y), jnp.asarray(m)
    g = batch.to_graph()

    def loss_with(impl):
        def fn(p):
            logits = model.apply(p, batch if impl != "reference" else g, xj, impl=impl)
            import optax

            if logits.shape[-1] == 1:
                l = optax.sigmoid_binary_cross_entropy(
                    logits.squeeze(-1), yj.astype(jnp.float32)
                )
            elif yj.ndim == 2:
                # multilabel: [G, C] float targets, NaN = missing label
                y = yj.astype(jnp.float32)
                labeled = ~jnp.isnan(y) & mj[:, None].astype(bool)
                l = optax.sigmoid_binary_cross_entropy(
                    logits, jnp.where(labeled, y, 0.0))
                l = jnp.where(labeled, l, 0.0)
                return jnp.sum(l) / jnp.maximum(jnp.sum(labeled), 1)
            else:
                l = optax.softmax_cross_entropy_with_integer_labels(
                    logits, jnp.maximum(yj, 0)
                )
            return jnp.sum(l * mj) / jnp.maximum(jnp.sum(mj), 1)

        return fn

    g_fused = jax.grad(loss_with("flash"))(params)
    g_ref = jax.grad(loss_with("reference"))(params)
    ok = True
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    for (path, a), (_, b) in zip(flat_f, flat_r):
        name = jax.tree_util.keystr(path)
        close = np.allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-2)
        if not close:
            ok = False
            print(f"  grad mismatch at {name}: "
                  f"max|d|={float(jnp.max(jnp.abs(a - b))):.3e}")
    print("checkgrad:", "OK" if ok else "FAIL")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
