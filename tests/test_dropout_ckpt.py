"""Attention dropout + checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np

from dfgnn_tpu.graph import DenseBatch
from dfgnn_tpu.models.conv import GATConv
from helpers import make_graph, random_graph_coo


def test_gat_dropout_train_vs_eval(rng):
    g = make_graph(rng, 40, 6, zero_deg_frac=0.0)
    x = jnp.asarray(rng.standard_normal((40, 8)).astype(np.float32))
    layer = GATConv(out_size=8, num_heads=2, dropout=0.5)
    params = layer.init(jax.random.key(0), g, x)
    out_eval = layer.apply(params, g, x, deterministic=True)
    out_eval2 = layer.apply(params, g, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_eval2))
    out_tr1 = layer.apply(params, g, x, deterministic=False,
                          rngs={"dropout": jax.random.key(1)})
    out_tr2 = layer.apply(params, g, x, deterministic=False,
                          rngs={"dropout": jax.random.key(2)})
    assert np.abs(np.asarray(out_tr1) - np.asarray(out_tr2)).max() > 1e-6
    # expectation approx preserved over many rng draws
    outs = [
        np.asarray(layer.apply(params, g, x, deterministic=False,
                               rngs={"dropout": jax.random.key(i)}))
        for i in range(64)
    ]
    np.testing.assert_allclose(np.mean(outs, 0), np.asarray(out_eval),
                               rtol=0.5, atol=0.2)


def test_dropout_dense_batch(rng):
    graphs = [(np.array([0, 1, 2, 1]), np.array([1, 2, 0, 0]), 3)]
    batch = DenseBatch.from_graph_list(graphs, np_pad=8)
    x = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    layer = GATConv(out_size=4, dropout=0.3)
    params = layer.init(jax.random.key(0), batch, x)
    out = layer.apply(params, batch, x, deterministic=False,
                      rngs={"dropout": jax.random.key(3)})
    assert np.isfinite(np.asarray(out)).all()


def test_checkpoint_roundtrip(tmp_path, rng):
    from dfgnn_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint

    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "count": jnp.asarray(3),
    }
    save_checkpoint(str(tmp_path / "ck"), state, step=7)
    restored, step = restore_checkpoint(str(tmp_path / "ck"), state)
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
