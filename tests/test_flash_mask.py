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


def _with_val(rng, batch):
    adj = np.asarray(batch.adj)
    val = np.where(adj, rng.standard_normal(adj.shape).astype(np.float32),
                   0.0)
    return batch.replace(val=jnp.asarray(val))


@pytest.mark.parametrize("score", ["dot", "add"])
def test_flash_edge_values(rng, score):
    """Edge-value score scaling in the flash kernels (VERDICT r2 item 6):
    a val-carrying DenseBatch runs the Pallas path and matches the dense
    formulation, forward and grads (ref: fused_gtconv_hyper.cu:208-222)."""
    batch = _with_val(rng, _batch(rng, B=2))
    B, P, h, f = batch.n_graphs, batch.np_pad, 2, 16
    q, k, v = (jnp.asarray(rng.standard_normal((B, P, h, f)).astype(np.float32))
               for _ in range(3))
    er, ec = (jnp.asarray(rng.standard_normal((B, P, h)).astype(np.float32))
              for _ in range(2))
    kw = dict(score=score)
    if score == "add":
        args = (None, None, v)
        kw.update(e_row=er, e_col=ec)
    else:
        args = (q, k, v)
    want = dense_graph_attention(batch, *args, **kw)
    got = flash_graph_attention(batch, *args, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    def loss(fn, v):
        a = (q, k, v) if score == "dot" else (None, None, v)
        return jnp.sum(fn(batch, *a, **kw) ** 2)

    gf = jax.grad(lambda v: loss(flash_graph_attention, v))(v)
    gd = jax.grad(lambda v: loss(dense_graph_attention, v))(v)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                               rtol=2e-3, atol=2e-3)


def test_flash_edge_values_via_dispatch(rng):
    """auto on a val-carrying DenseBatch now hits the Pallas flash path
    (no silent dense reroute) and matches the oracle."""
    from dfgnn_tpu.ops import graph_attention

    batch = _with_val(rng, _batch(rng, B=2))
    B, P, h, f = batch.n_graphs, batch.np_pad, 1, 32
    q, k, v = (jnp.asarray(rng.standard_normal((B, P, h, f)).astype(np.float32))
               for _ in range(3))
    got = graph_attention(batch, q, k, v, method="flash")
    want = dense_graph_attention(batch, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_gat_fused_layer_matches_decomposed(rng):
    """Whole-layer GAT kernel (W proj + a_l/a_r scoring + attention in one
    pallas_call, VERDICT r2 item 6 / ref hyper_v2 N11): same params as the
    decomposed path, same output, same grads, dropout parity."""
    from dfgnn_tpu.models import make_conv

    batch = _batch(rng, B=4)
    nf = batch.n_graphs * batch.np_pad
    x = jnp.asarray(rng.standard_normal((nf, 24)).astype(np.float32))
    layer = make_conv("gat", out_size=16, num_heads=2)
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

    # in-kernel dropout: fused layer == decomposed flash with same seed
    layer_d = make_conv("gat", out_size=16, num_heads=2, dropout=0.4)
    pd = layer_d.init(jax.random.key(0), batch, x)
    od_f = layer_d.apply(pd, batch, x, impl="flash_fused",
                         deterministic=False,
                         rngs={"dropout": jax.random.key(5)})
    od_d = layer_d.apply(pd, batch, x, impl="flash", deterministic=False,
                         rngs={"dropout": jax.random.key(5)})
    np.testing.assert_allclose(np.asarray(od_f), np.asarray(od_d),
                               rtol=2e-4, atol=2e-4)


def test_gat_fused_layer_bf16_auto(rng):
    """GAT dtype=bf16 + auto routes a DenseBatch through the one-kernel
    fused layer and stays close to the fp32 decomposed output."""
    from dfgnn_tpu.models import make_conv

    batch = _batch(rng, B=2)
    nf = batch.n_graphs * batch.np_pad
    x = jnp.asarray(rng.standard_normal((nf, 16)).astype(np.float32))
    layer = make_conv("gat", out_size=16, num_heads=1, dtype=jnp.bfloat16)
    params = layer.init(jax.random.key(0), batch, x)
    got = layer.apply(params, batch, x).astype(jnp.float32)
    layer32 = make_conv("gat", out_size=16, num_heads=1)
    want = layer32.apply(params, batch, x, impl="flash").astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    assert float(jnp.max(jnp.abs(got - want))) / scale < 5e-2


def test_flash_layer_fused_bf16_auto(rng):
    """GT dtype=bf16 + method auto routes a DenseBatch to the XLA dense
    formulation (the measured winner, BENCH_r04 / NOTES_r4 item 2), and
    the one-kernel fused layer stays close to it (reachable via impl=)."""
    from dfgnn_tpu.models import make_conv

    batch = _batch(rng, B=2)
    nf = batch.n_graphs * batch.np_pad
    x = jnp.asarray(rng.standard_normal((nf, 32)).astype(np.float32))
    layer = make_conv("gt", out_size=32, num_heads=1, method="auto",
                      dtype=jnp.bfloat16)
    params = layer.init(jax.random.key(0), batch, x)
    got_auto = layer.apply(params, batch, x).astype(jnp.float32)
    want = layer.apply(params, batch, x, impl="dense").astype(jnp.float32)
    # auto IS the dense path (bitwise): the default matches the winner
    assert np.array_equal(np.asarray(got_auto), np.asarray(want))
    got_fused = layer.apply(params, batch, x,
                            impl="flash_fused").astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    assert float(jnp.max(jnp.abs(got_fused - want))) / scale < 5e-2


def test_auto_bf16_routing_thresholds():
    """The bf16-auto routing encodes the r5 shmoo crossovers: dense for
    small workloads, fused-layer (gt) / flash (agnn) at >=200k tokens,
    flash at wide dims (results/shmoo_{gt,agnn}.json)."""
    from dfgnn_tpu.graph import DenseBatch
    from dfgnn_tpu.models.conv import _auto_bf16_dense_batch

    def fake(B, P, val=None):
        return DenseBatch(adj=None, node_mask=None, val=val, n_graphs=B,
                          np_pad=P)

    small, big = fake(1024, 128), fake(2048, 128)
    assert _auto_bf16_dense_batch("gt", small, 128) == "dense"
    assert _auto_bf16_dense_batch("gt", big, 128) == "flash_fused"
    assert _auto_bf16_dense_batch("gt", small, 256) == "flash"
    # val-carrying batches have no fused-layer kernel path; plain flash
    # LOSES to dense at bs=2048 (0.885 vs 0.847) so dense stays
    assert _auto_bf16_dense_batch("gt", fake(2048, 128, val=1), 128) == "dense"
    assert _auto_bf16_dense_batch("agnn", small, 128) == "dense"
    assert _auto_bf16_dense_batch("agnn", big, 128) == "flash"
    assert _auto_bf16_dense_batch("agnn", small, 256) == "flash"
