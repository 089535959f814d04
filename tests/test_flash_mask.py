"""Pallas flash-mask kernel vs XLA dense path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfgnn_tpu.graph import DenseBatch
from dfgnn_tpu.ops.dense_block import dense_graph_attention
from dfgnn_tpu.ops.pallas.flash_mask import flash_graph_attention
from helpers import random_graph_coo


def _batch(rng, B=3, np_pad=128):
    graphs = []
    for _ in range(B):
        nb = int(rng.integers(60, np_pad))
        r, c, _ = random_graph_coo(rng, nb, 8, zero_deg_frac=0.15)
        graphs.append((r, c, nb))
    return DenseBatch.from_graph_list(graphs, np_pad=np_pad)


@pytest.mark.parametrize("h,f", [(1, 128), (2, 64)])
def test_flash_dot_forward(rng, h, f):
    batch = _batch(rng)
    B, P = batch.n_graphs, batch.np_pad
    q, k, v = (jnp.asarray(rng.standard_normal((B, P, h, f)).astype(np.float32)) for _ in range(3))
    want = dense_graph_attention(batch, q, k, v)
    got = flash_graph_attention(batch, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_flash_add_forward(rng):
    batch = _batch(rng)
    B, P, h, f = batch.n_graphs, batch.np_pad, 2, 32
    v = jnp.asarray(rng.standard_normal((B, P, h, f)).astype(np.float32))
    er = jnp.asarray(rng.standard_normal((B, P, h)).astype(np.float32))
    ec = jnp.asarray(rng.standard_normal((B, P, h)).astype(np.float32))
    want = dense_graph_attention(batch, None, None, v, score="add", e_row=er, e_col=ec)
    got = flash_graph_attention(batch, None, None, v, score="add", e_row=er, e_col=ec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_flash_dot_grads_match_dense(rng):
    batch = _batch(rng, B=2)
    B, P, h, f = batch.n_graphs, batch.np_pad, 1, 32
    q, k, v = (jnp.asarray(rng.standard_normal((B, P, h, f)).astype(np.float32)) for _ in range(3))
    t = jnp.asarray(rng.standard_normal((B, P, h, f)).astype(np.float32))
    g_flash = jax.grad(lambda q, k, v: jnp.sum(flash_graph_attention(batch, q, k, v) * t), (0, 1, 2))(q, k, v)
    g_dense = jax.grad(lambda q, k, v: jnp.sum(dense_graph_attention(batch, q, k, v) * t), (0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_flash_add_grads_match_dense(rng):
    batch = _batch(rng, B=2)
    B, P, h, f = batch.n_graphs, batch.np_pad, 2, 16
    v = jnp.asarray(rng.standard_normal((B, P, h, f)).astype(np.float32))
    er = jnp.asarray(rng.standard_normal((B, P, h)).astype(np.float32))
    ec = jnp.asarray(rng.standard_normal((B, P, h)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((B, P, h, f)).astype(np.float32))

    def loss(fn, er, ec, v):
        return jnp.sum(fn(batch, None, None, v, score="add", e_row=er, e_col=ec) * t)

    g_flash = jax.grad(lambda er, ec, v: loss(flash_graph_attention, er, ec, v), (0, 1, 2))(er, ec, v)
    g_dense = jax.grad(lambda er, ec, v: loss(dense_graph_attention, er, ec, v), (0, 1, 2))(er, ec, v)
    for a, b in zip(g_flash, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_flash_under_jit_and_dispatch(rng):
    from dfgnn_tpu.ops import graph_attention

    batch = _batch(rng, B=2)
    B, P, h, f = batch.n_graphs, batch.np_pad, 1, 64
    q, k, v = (jnp.asarray(rng.standard_normal((B, P, h, f)).astype(np.float32)) for _ in range(3))
    got = jax.jit(lambda q, k, v: graph_attention(batch, q, k, v, method="flash"))(q, k, v)
    want = dense_graph_attention(batch, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_flash_large_p_multihead(rng):
    """COCO-SP-ish shapes: P=512, 4 heads."""
    batch = _batch(rng, B=2, np_pad=512)
    B, P, h, f = batch.n_graphs, batch.np_pad, 4, 32
    q, k, v = (jnp.asarray(rng.standard_normal((B, P, h, f)).astype(np.float32)) for _ in range(3))
    want = dense_graph_attention(batch, q, k, v)
    got = flash_graph_attention(batch, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_flash_layer_fused_matches_decomposed(rng):
    """Fused-layer kernel (QKV projection + attention in one pallas_call)
    vs the decomposed Dense+flash path: same params, same output, same
    grads, identical parameter tree."""
    from dfgnn_tpu.models import make_conv

    batch = _batch(rng, B=4)
    nf = batch.n_graphs * batch.np_pad
    x = jnp.asarray(rng.standard_normal((nf, 48)).astype(np.float32))
    layer = make_conv("gt", out_size=64, num_heads=2, method="flash")
    params = layer.init(jax.random.key(0), batch, x)
    params_fused = layer.init(jax.random.key(0), batch, x, impl="flash_fused")
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_fused))

    ref = layer.apply(params, batch, x, impl="flash")
    got = layer.apply(params, batch, x, impl="flash_fused")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    def loss(p, impl):
        return jnp.sum(layer.apply(p, batch, x, impl=impl) ** 2) * 1e-3

    g1 = jax.grad(lambda p: loss(p, "flash"))(params)
    g2 = jax.grad(lambda p: loss(p, "flash_fused"))(params)
    scale = max(float(jnp.max(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g1))
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-4


def test_flash_layer_fused_bf16_auto(rng):
    """dtype=bf16 + method auto routes a DenseBatch through the fused-layer
    kernel and stays close to the XLA dense bf16 formulation."""
    from dfgnn_tpu.models import make_conv

    batch = _batch(rng, B=2)
    nf = batch.n_graphs * batch.np_pad
    x = jnp.asarray(rng.standard_normal((nf, 32)).astype(np.float32))
    layer = make_conv("gt", out_size=32, num_heads=1, method="auto",
                      dtype=jnp.bfloat16)
    params = layer.init(jax.random.key(0), batch, x)
    got = layer.apply(params, batch, x).astype(jnp.float32)
    want = layer.apply(params, batch, x, impl="dense").astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    assert float(jnp.max(jnp.abs(got - want))) / scale < 5e-2
