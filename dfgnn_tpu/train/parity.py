"""Fused-vs-unfused accuracy parity harness.

The reference trains the fused and unfused paths sequentially on the same
task and compares the end metric (``DFGNN/script/train/train_gtconv.py:
225-227`` with ROC-AUC per epoch :80-103; ``train_gatconv.py:250-252`` with
test accuracy).  This module does the same on learnable synthetic tasks —
SBM block labels with noisy one-hot features (PATTERN-style planted
communities) — so parity is measurable without dataset downloads:

* ``batched``: PATTERN-like batch of SBM graphs -> DenseBatch; fused =
  flash kernel, unfused = segment-op oracle on the block-diagonal graph.
* ``full``: one SBM full graph -> BucketedGraph (fused custom-vjp bucket
  path) vs oracle, with a train/test node split.

Same init, same data order, same optimizer on both sides; the only
difference is the attention implementation, so the metric gap isolates
kernel numerics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dfgnn_tpu import formats
from dfgnn_tpu.data.synthetic import pattern_like_batch, sbm_graph
from dfgnn_tpu.graph import DenseBatch, Graph
from dfgnn_tpu.models import FullGraphNet
from dfgnn_tpu.train.loop import evaluate_accuracy


def _noisy_onehot(rng, block, n_classes: int, noise: float = 0.3):
    """Features = one-hot(block) corrupted with probability ``noise`` — the
    planted signal a GNN recovers by neighborhood aggregation (homophily),
    making block classification learnable AND attention-dependent."""
    n = len(block)
    lab = np.where(rng.random(n) < noise,
                   rng.integers(0, n_classes, size=n), block)
    return np.eye(n_classes, dtype=np.float32)[lab]


def _train(model, params, g, x, y, mask, steps: int, lr: float, impl=None):
    opt = optax.adam(lr)

    def loss_fn(p):
        logits = model.apply(p, g, x, impl=impl)
        l = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.maximum(y, 0))
        return jnp.sum(l * mask) / jnp.maximum(jnp.sum(mask), 1)

    @jax.jit
    def step(p, o):
        l, grads = jax.value_and_grad(loss_fn)(p)
        up, o = opt.update(grads, o)
        return optax.apply_updates(p, up), o, l

    o = opt.init(params)
    for _ in range(steps):
        params, o, l = step(params, o)
    return params, float(l)


def _accuracy(model, params, g, x, y, mask, impl=None):
    logits = model.apply(params, g, x, impl=impl)
    pred = jnp.argmax(logits, axis=-1)
    return evaluate_accuracy(np.asarray(y), np.asarray(pred),
                             np.asarray(mask))


def run_parity_batched(seed: int = 0, n_graphs: int = 32, hidden: int = 32,
                       layers: int = 2, steps: int = 120, lr: float = 1e-2,
                       conv: str = "gt", noise: float = 0.3,
                       dtype=None) -> dict:
    """PATTERN-like node classification: flash-fused vs oracle.

    ``dtype=jnp.bfloat16`` trains the FUSED side in bf16 via the auto
    route (the whole-layer Pallas kernel on a DenseBatch) while the
    unfused oracle stays fp32 — the bf16-vs-fp32 accuracy-parity case."""
    rng = np.random.default_rng(seed)
    graphs = pattern_like_batch(rng, n_graphs)
    P = 128
    batch = DenseBatch.from_graph_list(
        [(r, c, n) for r, c, n, _ in graphs], np_pad=P).device_put()
    x = np.zeros((n_graphs * P, 2), dtype=np.float32)
    y = np.zeros(n_graphs * P, dtype=np.int32)
    for b, (_, _, n, block) in enumerate(graphs):
        x[b * P : b * P + n] = _noisy_onehot(rng, block, 2, noise)
        y[b * P : b * P + n] = block
    mask = np.asarray(batch.node_mask).reshape(-1).astype(np.float32)
    x, y, mask = jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask)
    g_ref = batch.to_graph().device_put()

    model = FullGraphNet(conv=conv, num_classes=2, hidden_size=hidden,
                         num_layers=layers, dtype=dtype)
    model_ref = FullGraphNet(conv=conv, num_classes=2, hidden_size=hidden,
                             num_layers=layers)
    # bf16 mode: fused side takes the auto route (whole-layer kernel);
    # fp32 keeps the explicit flash kernel.  Param trees are identical.
    fused_impl = None if dtype is not None else "flash"
    params0 = model.init(jax.random.key(seed), batch, x, impl=fused_impl)

    p_f, _ = _train(model, params0, batch, x, y, mask, steps, lr,
                    impl=fused_impl)
    p_u, _ = _train(model_ref, params0, g_ref, x, y, mask, steps, lr,
                    impl="reference")
    acc_f = _accuracy(model, p_f, batch, x, y, mask, impl=fused_impl)
    acc_u = _accuracy(model_ref, p_u, g_ref, x, y, mask, impl="reference")
    base = max(float(jnp.mean((y == 0) * mask) / jnp.mean(mask)),
               float(jnp.mean((y == 1) * mask) / jnp.mean(mask)))
    return {"task": "batched-SBM", "acc_fused": acc_f, "acc_unfused": acc_u,
            "gap": abs(acc_f - acc_u), "majority_baseline": base}


def run_parity_full(seed: int = 0, n: int = 2000, n_blocks: int = 4,
                    avg_deg: float = 20.0, hidden: int = 32, layers: int = 2,
                    steps: int = 120, lr: float = 1e-2, conv: str = "gt",
                    noise: float = 0.3, dataset=None) -> dict:
    """Full-graph node classification: bucket-fused vs oracle.

    ``dataset``: optional real FullGraphDataset (cora etc.) with labels —
    used instead of the SBM when its labels/features are real."""
    rng = np.random.default_rng(seed)
    if dataset is not None and not dataset.synthetic:
        g = Graph.from_coo(dataset.rows, dataset.cols, dataset.n_nodes)
        x = np.asarray(dataset.features, dtype=np.float32)
        y = np.asarray(dataset.labels, dtype=np.int32)
        n = dataset.n_nodes
        n_classes = int(y.max()) + 1
        name = dataset.name
    else:
        rows, cols, block = sbm_graph(rng, n, n_blocks=n_blocks,
                                      avg_deg=avg_deg)
        g = Graph.from_coo(rows, cols, n)
        x = _noisy_onehot(rng, block, n_blocks, noise)
        y = block.astype(np.int32)
        n_classes = n_blocks
        name = "full-SBM"
    train_mask = (rng.random(n) < 0.5).astype(np.float32)
    test_mask = 1.0 - train_mask

    bg = formats.preprocess("bucketed_train", g, split_width=64).device_put()
    g_ref = g.device_put()
    x, y = jnp.asarray(x), jnp.asarray(y)
    train_m, test_m = jnp.asarray(train_mask), jnp.asarray(test_mask)

    model = FullGraphNet(conv=conv, num_classes=n_classes,
                         hidden_size=hidden, num_layers=layers)
    params0 = model.init(jax.random.key(seed), g_ref, x, impl="reference")

    p_f, _ = _train(model, params0, bg, x, y, train_m, steps, lr)
    p_u, _ = _train(model, params0, g_ref, x, y, train_m, steps, lr,
                    impl="reference")
    acc_f = _accuracy(model, p_f, bg, x, y, test_m)
    acc_u = _accuracy(model, p_u, g_ref, x, y, test_m, impl="reference")
    counts = np.bincount(np.asarray(y)[test_mask.astype(bool)],
                         minlength=n_classes)
    base = float(counts.max() / max(counts.sum(), 1))
    return {"task": name, "acc_fused": acc_f, "acc_unfused": acc_u,
            "gap": abs(acc_f - acc_u), "majority_baseline": base}
