"""Conv layers + model assembly: shapes, layout consistency, training step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dfgnn_tpu.formats import build_buckets
from dfgnn_tpu.graph import DenseBatch
from dfgnn_tpu.models import GTModel, FullGraphNet, GATNet, Model, make_conv, graph_pool
from helpers import make_graph, random_graph_coo


@pytest.mark.parametrize("conv", ["gt", "gat", "agnn", "dotgat"])
def test_conv_layout_consistency(rng, conv):
    """Same params, same graph: oracle path == bucketed path == dense path."""
    layer = make_conv(conv, out_size=16, num_heads=2)
    graphs = []
    for _ in range(3):
        nb = int(rng.integers(20, 40))
        r, c, _ = random_graph_coo(rng, nb, 5, zero_deg_frac=0.1)
        graphs.append((r, c, nb))
    batch = DenseBatch.from_graph_list(graphs, np_pad=64)
    g = batch.to_graph()
    bg = build_buckets(g)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 8)).astype(np.float32))
    params = layer.init(jax.random.key(0), g, x, impl="reference")
    out_ref = layer.apply(params, g, x, impl="reference")
    out_buk = layer.apply(params, bg, x)
    out_den = layer.apply(params, batch, x)
    assert out_ref.shape == (g.n_nodes, 16 * 2 if conv == "gat" else 16)
    np.testing.assert_allclose(np.asarray(out_buk), np.asarray(out_ref), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_den), np.asarray(out_ref), rtol=1e-3, atol=1e-5)


def test_graph_pool_sum_matches_manual(rng):
    graphs = []
    for _ in range(4):
        nb = int(rng.integers(5, 20))
        r, c, _ = random_graph_coo(rng, nb, 3, zero_deg_frac=0.0)
        graphs.append((r, c, nb))
    batch = DenseBatch.from_graph_list(graphs, np_pad=32)
    g = batch.to_graph()
    x = rng.standard_normal((g.n_nodes, 6)).astype(np.float32)
    # zero padded nodes for the flat-graph manual sum
    mask = np.asarray(batch.node_mask).reshape(-1)
    want = np.stack([
        x[b * 32: b * 32 + graphs[b][2]].sum(axis=0) for b in range(4)
    ])
    got_dense = graph_pool(batch, jnp.asarray(x))
    got_flat = graph_pool(g, jnp.asarray(x * mask[:, None]))
    np.testing.assert_allclose(np.asarray(got_dense), want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_flat), want, rtol=1e-5, atol=1e-5)


def test_gtmodel_train_step_decreases_loss(rng):
    """One optax Adam step on a PATTERN-like batch lowers BCE loss
    (role of train_gtconv.py's training loop)."""
    graphs = []
    for _ in range(8):
        nb = int(rng.integers(20, 40))
        r, c, _ = random_graph_coo(rng, nb, 5, zero_deg_frac=0.0)
        graphs.append((r, c, nb))
    batch = DenseBatch.from_graph_list(graphs, np_pad=64)
    # PATTERN-style categorical node feature in {0,1,2}
    x = jnp.asarray(rng.integers(0, 3, size=(batch.n_graphs * batch.np_pad,)))
    y = jnp.asarray(rng.integers(0, 2, size=(batch.n_graphs, 1)).astype(np.float32))
    model = GTModel("PATTERN", out_size=1, hidden_size=16, num_layers=2)
    params = model.init(jax.random.key(0), batch, x)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def loss_fn(p):
        logits = model.apply(p, batch, x)
        return optax.sigmoid_binary_cross_entropy(logits, y).mean()

    l0, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = opt.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    l1 = loss_fn(params)
    assert np.isfinite(l0) and l1 < l0


def test_fullgraph_net_forward(rng):
    g = make_graph(rng, 50, 5)
    bg = build_buckets(g)
    x = jnp.asarray(rng.standard_normal((50, 12)).astype(np.float32))
    model = FullGraphNet(conv="gt", num_classes=7, hidden_size=16, num_layers=2)
    params = model.init(jax.random.key(1), g, x, impl="reference")
    out_ref = model.apply(params, g, x, impl="reference")
    out_buk = model.apply(params, bg, x)
    assert out_ref.shape == (50, 7)
    # log-probs normalise
    np.testing.assert_allclose(np.asarray(jnp.exp(out_ref)).sum(-1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_buk), np.asarray(out_ref), rtol=1e-3, atol=2e-4)


def test_gatnet_forward_and_grad(rng):
    g = make_graph(rng, 40, 4)
    x = jnp.asarray(rng.standard_normal((40, 10)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, size=(40,)))
    model = GATNet(num_classes=3, hidden_size=8, num_layers=2, num_heads=2)
    params = model.init(jax.random.key(2), g, x)
    def loss(p):
        lp = model.apply(p, g, x)
        return -jnp.mean(jnp.take_along_axis(lp, y[:, None], axis=1))
    l, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(l)
    leaves = jax.tree.leaves(grads)
    assert any(float(jnp.abs(a).max()) > 0 for a in leaves)


def test_model_single_conv_wrapper(rng):
    graphs = [(np.array([0, 1, 2]), np.array([1, 2, 0]), 3)]
    batch = DenseBatch.from_graph_list(graphs, np_pad=8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 3)).astype(np.float32))
    m = Model("MNIST", conv="gt", hidden_size=16)
    params = m.init(jax.random.key(0), batch, x)
    out = m.apply(params, batch, x)
    assert out.shape == (8, 16)


def test_multilabel_bce_loss(rng):
    """molpcba-style multi-label loss (VERDICT r2 missing #4): per-task BCE
    over [G, C] float targets with NaN holes masked out (ref
    train_gtconv.py:156 BCEWithLogitsLoss + ogb is-labeled mask)."""
    from dfgnn_tpu.train import make_loss_fn

    G, C = 6, 5
    graphs = [(np.array([0, 1]), np.array([1, 0]), 2) for _ in range(G)]
    batch = DenseBatch.from_graph_list(graphs, np_pad=8)
    x = jnp.asarray(rng.standard_normal((G * 8, 4)).astype(np.float32))
    model = GTModel("CIFAR10", out_size=C, hidden_size=8, num_layers=1,
                    num_heads=1)
    params = model.init(jax.random.key(0), batch, x)
    y = rng.integers(0, 2, size=(G, C)).astype(np.float32)
    y[0, 2] = np.nan
    y[3, :] = np.nan
    mask = np.ones(G, bool)
    loss_fn = make_loss_fn(model, "graph_classification_multilabel", C)
    l = loss_fn(params, batch, x, jnp.asarray(y), jnp.asarray(mask))
    assert np.isfinite(float(l)), float(l)
    # NaN targets contribute nothing: replacing them with wild values
    # must not change the loss
    y2 = np.where(np.isnan(y), 1e6, y)
    y2[0, 2] = np.nan
    y2[3, :] = np.nan
    l2 = loss_fn(params, batch, x, jnp.asarray(y2), jnp.asarray(mask))
    np.testing.assert_allclose(float(l), float(l2), rtol=1e-6)
    # grads finite
    g = jax.grad(loss_fn)(params, batch, x, jnp.asarray(y), jnp.asarray(mask))
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_evaluate_mean_ap():
    """Mean-AP metric (ogb molpcba AP protocol analog): NaN labels and
    masked graphs are excluded per task; perfect ranking scores 1.0."""
    from dfgnn_tpu.train import evaluate_mean_ap

    y = np.array([[1.0, 0.0], [0.0, np.nan], [1.0, 1.0], [0.0, 0.0]])
    perfect = np.where(np.nan_to_num(y) > 0.5, 2.0, -2.0)
    assert evaluate_mean_ap(y, perfect) == 1.0
    # inverted ranking is worse than perfect
    assert evaluate_mean_ap(y, -perfect) < 1.0
    # mask drops rows: with rows {0,1,3} task 0 keeps both classes
    # (scorable), task 1 keeps only 0-labels -> skipped; still finite
    m = np.array([1, 1, 0, 1], bool)
    v = evaluate_mean_ap(y, perfect, mask=m)
    assert v == 1.0
    # all-masked -> no scorable task -> nan
    assert np.isnan(evaluate_mean_ap(y, perfect, mask=np.zeros(4, bool)))


def test_atom_encoder_out_of_range_clips(rng):
    """Out-of-vocab atom ids must clip, not hit nn.Embed's NaN fill
    (jnp.take fills out-of-range with NaN and poisons the forward)."""
    from dfgnn_tpu.models.model import AtomEncoder, _ATOM_FEATURE_DIMS

    enc = AtomEncoder(hidden_size=8)
    x_ok = np.stack([rng.integers(0, v, 16) for v in _ATOM_FEATURE_DIMS],
                    axis=1).astype(np.int32)
    p = enc.init(jax.random.key(0), jnp.asarray(x_ok))
    h = enc.apply(p, jnp.asarray(x_ok))
    assert np.isfinite(np.asarray(h)).all()
    # ids beyond every vocab behave as the max id, never NaN
    x_hi = np.full_like(x_ok, 1000)
    x_max = np.array([[v - 1 for v in _ATOM_FEATURE_DIMS]] * 16, np.int32)
    h_hi = enc.apply(p, jnp.asarray(x_hi))
    np.testing.assert_allclose(np.asarray(h_hi),
                               np.asarray(enc.apply(p, jnp.asarray(x_max))))
