"""Training loop building blocks.

Role of the reference's training scripts' shared machinery
(``script/train/train_gtconv.py:146-227``: Adam + StepLR + BCE loss +
ogb ROC-AUC evaluator; ``train_full_graph_timing.py``: epoch timing).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    opt: optax.GradientTransformation
    step_fn: Callable

    @staticmethod
    def create(model, params, lr: float = 1e-3, *, step_lr_every: int = 0,
               step_lr_gamma: float = 0.5, weight_decay: float = 0.0):
        """Adam (+ optional StepLR schedule, parity with the reference's
        ``optim.Adam`` + ``StepLR``, ``train_gtconv.py:151-154``)."""
        if step_lr_every:
            sched = optax.exponential_decay(
                lr, transition_steps=step_lr_every, decay_rate=step_lr_gamma,
                staircase=True,
            )
        else:
            sched = lr
        opt = (optax.adamw(sched, weight_decay=weight_decay)
               if weight_decay else optax.adam(sched))
        return TrainState(params=params, opt_state=opt.init(params), opt=opt,
                          step_fn=None)


def make_loss_fn(model, task: str, num_classes: int):
    """Loss matching the reference per task: BCE-with-logits for molhiv-style
    graph classification (``train_gtconv.py:156``), NLL for node
    classification (``train_full_graph_timing.py:35``), L1 for regression."""

    if task == "graph_classification" and num_classes == 1:
        def loss(params, g, x, y, mask):
            logits = model.apply(params, g, x)
            l = optax.sigmoid_binary_cross_entropy(logits.squeeze(-1), y.astype(jnp.float32))
            return jnp.sum(l * mask) / jnp.maximum(jnp.sum(mask), 1)
    elif task == "graph_classification_multilabel":
        # C independent binary tasks (molpcba / Peptides-func): per-task
        # BCE over [G, C] float targets, NaN = missing label (masked out),
        # matching the reference's BCEWithLogitsLoss on ogb's is-labeled
        # mask (train_gtconv.py:156,168-171).
        def loss(params, g, x, y, mask):
            logits = model.apply(params, g, x)
            y = y.astype(jnp.float32)
            labeled = ~jnp.isnan(y) & mask[:, None].astype(bool)
            y_safe = jnp.where(labeled, y, 0.0)
            l = optax.sigmoid_binary_cross_entropy(logits, y_safe)
            l = jnp.where(labeled, l, 0.0)
            return jnp.sum(l) / jnp.maximum(jnp.sum(labeled), 1)
    elif task in ("graph_classification", "node_classification"):
        def loss(params, g, x, y, mask):
            logits = model.apply(params, g, x)
            y_safe = jnp.maximum(y, 0)
            l = optax.softmax_cross_entropy_with_integer_labels(logits, y_safe)
            return jnp.sum(l * mask) / jnp.maximum(jnp.sum(mask), 1)
    elif task == "graph_regression":
        def loss(params, g, x, y, mask):
            pred = model.apply(params, g, x)
            l = jnp.abs(pred - y).mean(-1)
            return jnp.sum(l * mask) / jnp.maximum(jnp.sum(mask), 1)
    else:
        raise ValueError(task)
    return loss


def train_step(state: TrainState, loss_fn, g, x, y, mask):
    """One jittable update; returns (new_state, loss)."""
    loss, grads = jax.value_and_grad(loss_fn)(state.params, g, x, y, mask)
    updates, opt_state = state.opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.opt, state.step_fn), loss


def evaluate_rocauc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """ROC-AUC (role of the ogb ``Evaluator('ogbg-molhiv')``,
    ``train_gtconv.py:80-103``)."""
    from sklearn.metrics import roc_auc_score

    y_true = np.asarray(y_true).reshape(-1)
    y_score = np.asarray(y_score).reshape(-1)
    if len(np.unique(y_true)) < 2:
        return float("nan")
    return float(roc_auc_score(y_true, y_score))


def evaluate_mean_ap(y_true: np.ndarray, y_score: np.ndarray,
                     mask=None) -> float:
    """Mean average precision over C binary tasks with NaN = missing label
    (role of the ogb ``Evaluator('ogbg-molpcba')`` AP metric the reference's
    multilabel configs report; Peptides-func uses the same protocol)."""
    from sklearn.metrics import average_precision_score

    y_true = np.asarray(y_true, dtype=np.float64)
    y_score = np.asarray(y_score, dtype=np.float64)
    if mask is not None:
        m = np.asarray(mask).reshape(-1).astype(bool)
        y_true, y_score = y_true[m], y_score[m]
    aps = []
    for t in range(y_true.shape[1]):
        lab = ~np.isnan(y_true[:, t])
        if lab.any() and len(np.unique(y_true[lab, t])) == 2:
            aps.append(average_precision_score(y_true[lab, t],
                                               y_score[lab, t]))
    return float(np.mean(aps)) if aps else float("nan")


def evaluate_accuracy(y_true, y_pred, mask=None) -> float:
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    if mask is not None:
        m = np.asarray(mask).reshape(-1).astype(bool)
        y_true, y_pred = y_true[m], y_pred[m]
    return float((y_true == y_pred).mean())
