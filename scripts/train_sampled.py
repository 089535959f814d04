#!/usr/bin/env python
"""Mini-batch training on a large full graph via neighborhood sampling.

New capability (BASELINE.json scope; no reference counterpart): GraphSAGE-
style layered sampling feeds fixed-fanout sampled blocks to the fused
bucketed attention path; one jit trace serves every re-sampled batch.

Features stay BLOCK-LOCAL between layers (``sample_localized``): every
tensor inside a step is O(batch * prod(fanouts)) — the full graph enters
only through one input-feature gather, never through per-layer scatters.

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
    from dfgnn_tpu.graph import Graph
    from dfgnn_tpu.models.conv import GTConv
    from dfgnn_tpu.utils.config import build_parser, parse_args

    p = build_parser(__doc__)
    p.add_argument(
        "--compare-full", action="store_true",
        help="also train the same 2-layer model on the FULL graph (fused "
             "bucket path) from the same init, and report the accuracy/"
             "steps-per-s/peak-memory comparison table (VERDICT r4 item 7)")
    args = parse_args(p, argv)
    ds = load_full_graph(args.dataset, args.data_dir)
    g = Graph.from_coo(ds.rows, ds.cols, ds.n_nodes)
    sampler = NeighborSampler(g)
    n = ds.n_nodes
    fanouts = [8, 8]
    # fixed per-layer seed caps + input-support cap -> one jit trace for
    # every batch (step cost O(batch * fanout^2), independent of n)
    pad_to = [args.batch_size, args.batch_size * (fanouts[0] + 1)]
    support_pad = args.batch_size * (fanouts[0] + 1) * (fanouts[1] + 1)

    x_full = jnp.asarray(ds.features[:, : args.dim].astype(np.float32))
    if x_full.shape[1] < args.dim:
        x_full = jnp.pad(x_full, [(0, 0), (0, args.dim - x_full.shape[1])])
    # one sentinel row so support gathers of padded slots read zeros
    x_full = jnp.concatenate([x_full, jnp.zeros((1, x_full.shape[1]))], 0)
    y_full = np.asarray(ds.labels)
    train_ids = np.nonzero(np.asarray(ds.train_mask))[0]

    class SampledNet(nn.Module):
        """2-layer GT over localized sampled blocks: layer li's rows are
        the li-th frontier; block indices chain layer outputs directly —
        no full-graph-sized buffer exists anywhere in the step."""

        hidden: int
        n_classes: int

        @nn.compact
        def __call__(self, blocks, x_sup):
            h = nn.Dense(self.hidden)(x_sup)
            for li, blk in enumerate(reversed(blocks)):
                h = GTConv(self.hidden, name=f"conv_{li}")(blk, h)
            return nn.Dense(self.n_classes)(h)

    model = SampledNet(hidden=args.dim, n_classes=ds.num_classes)
    rng = np.random.default_rng(0)
    seeds0 = train_ids[: args.batch_size]
    blocks0, sup0 = sampler.sample_localized(
        seeds0, fanouts, seed=0, pad_to=pad_to, support_pad=support_pad)
    blocks0 = [b.device_put() for b in blocks0]
    x_sup0 = jnp.take(x_full, jnp.asarray(sup0), axis=0, mode="clip")
    params = model.init(jax.random.key(0), blocks0, x_sup0)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    bs = args.batch_size

    # x_full rides as a jit ARGUMENT (a closed-over full-graph feature
    # table would be embedded as a compile-request constant)
    @jax.jit
    def step(params, opt_state, blocks, support, y_batch, x_full):
        x_sup = jnp.take(x_full, support, axis=0, mode="clip")

        def loss_fn(p):
            logits = model.apply(p, blocks, x_sup)[:bs]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y_batch).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, blocks, support, x_full):
        x_sup = jnp.take(x_full, support, axis=0, mode="clip")
        return jnp.argmax(model.apply(params, blocks, x_sup)[:bs], axis=-1)

    def eval_acc(params, ids):
        """Sampled inference over ``ids`` (fresh fanout draw per batch)."""
        hits = tot = 0
        for s in range(0, len(ids) - bs + 1, bs):
            seeds = ids[s : s + bs]
            blocks, sup = sampler.sample_localized(
                seeds, fanouts, seed=999_000 + s, pad_to=pad_to,
                support_pad=support_pad)
            blocks = [b.device_put() for b in blocks]
            pred = np.asarray(predict(params, blocks, jnp.asarray(sup), x_full))
            hits += int((pred == y_full[seeds]).sum())
            tot += bs
        return hits / max(tot, 1)

    def peak_mb():
        st = jax.local_devices()[0].memory_stats() or {}
        return st.get("peak_bytes_in_use", 0) / 1e6

    test_ids = np.nonzero(np.asarray(ds.test_mask))[0]
    steps_total, t_train = 0, 0.0
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        order = rng.permutation(train_ids)
        for s in range(0, len(order) - bs + 1, bs):
            seeds = order[s : s + bs]
            blocks, sup = sampler.sample_localized(
                seeds, fanouts, seed=epoch * 7919 + s, pad_to=pad_to,
                support_pad=support_pad)
            blocks = [b.device_put() for b in blocks]
            params, opt_state, loss = step(
                params, opt_state, blocks, jnp.asarray(sup),
                jnp.asarray(y_full[seeds]), x_full,
            )
            losses.append(float(loss))
        dt = time.time() - t0
        steps_total += len(losses)
        t_train += dt
        print(f"epoch {epoch}: loss={np.mean(losses):.4f} "
              f"({len(losses)} steps, {dt:.2f}s)", flush=True)
    acc_sampled = eval_acc(params, test_ids)
    print(f"[sampled] test acc={acc_sampled:.4f}  "
          f"steps/s={steps_total / t_train:.2f}  peak_mem={peak_mb():.0f}MB",
          flush=True)

    if not args.compare_full:
        return

    # ----- full-graph comparison: same depth/width, fused bucket path ----
    from dfgnn_tpu import formats

    bg = formats.preprocess("bucketed", g).device_put()

    class FullNet(nn.Module):
        hidden: int
        n_classes: int

        @nn.compact
        def __call__(self, gg, x):
            h = nn.Dense(self.hidden)(x)
            for li in range(2):
                h = GTConv(self.hidden, name=f"conv_{li}")(gg, h)
            return nn.Dense(self.n_classes)(h)

    fmodel = FullNet(hidden=args.dim, n_classes=ds.num_classes)
    xf = x_full[:n]
    fparams = fmodel.init(jax.random.key(0), bg, xf)
    fopt_state = opt.init(fparams)
    tr_mask = jnp.asarray(np.asarray(ds.train_mask))
    yj = jnp.asarray(y_full)

    @jax.jit
    def fstep(params, opt_state, x, bg):
        def loss_fn(p):
            logits = fmodel.apply(p, bg, x)
            l = optax.softmax_cross_entropy_with_integer_labels(logits, yj)
            return jnp.sum(l * tr_mask) / jnp.sum(tr_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    # match the sampled run's optimizer-step count
    t0 = time.time()
    fsteps = 0
    for _ in range(steps_total):
        fparams, fopt_state, floss = fstep(fparams, fopt_state, xf, bg)
        fsteps += 1
    jax.block_until_ready(floss)
    ft = time.time() - t0
    logits = np.asarray(jax.jit(
        lambda p, x, bg: fmodel.apply(p, bg, x))(fparams, xf, bg))
    acc_full = float(
        (logits.argmax(-1)[test_ids] == y_full[test_ids]).mean())
    print(f"[full]    test acc={acc_full:.4f}  "
          f"steps/s={fsteps / ft:.2f}  peak_mem={peak_mb():.0f}MB "
          f"(peak includes the sampled run's residue; full-graph step "
          f"touches the whole graph per step, sampled touches "
          f"O(batch*fanout^2))", flush=True)
    print(f"[compare] sampled-full acc gap = {acc_sampled - acc_full:+.4f}")


if __name__ == "__main__":
    main()
