"""Attention dropout + checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfgnn_tpu import formats
from dfgnn_tpu.graph import DenseBatch, Graph
from dfgnn_tpu.models.conv import GATConv
from dfgnn_tpu.ops.bucket import bucket_graph_attention
from dfgnn_tpu.ops.pallas.flash_mask import flash_graph_attention
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


def _small_graph(rng, n=400, e=3200):
    rows = rng.integers(0, n, e)
    cols = rng.integers(0, n, e)
    return Graph.from_coo(rows, cols, n)


def test_bucket_dropout_fwd_bwd(rng):
    """Fused bucket-path dropout: output differs from eval, expectation is
    approximately the eval output, and the fused custom backward matches
    XLA autodiff of the same masked forward (VERDICT r1 item 2)."""
    g = _small_graph(rng)
    n = g.n_nodes
    bg = formats.preprocess("bucketed_train", g, split_width=64).device_put()
    bg_nt = formats.preprocess("bucketed", g, split_width=64).device_put()
    h, f = 2, 8
    q, k, v = (jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
               for _ in range(3))
    key = jax.random.key(42)

    o0 = bucket_graph_attention(bg, q, k, v)
    od = bucket_graph_attention(bg, q, k, v, dropout_rate=0.5, dropout_rng=key)
    assert float(jnp.max(jnp.abs(o0 - od))) > 1e-3

    outs = [bucket_graph_attention(bg, q, k, v, dropout_rate=0.5,
                                   dropout_rng=jax.random.fold_in(key, i))
            for i in range(32)]
    mean = jnp.mean(jnp.stack(outs), axis=0)
    rel = float(jnp.linalg.norm(mean - o0) / jnp.linalg.norm(o0))
    assert rel < 0.35, rel  # ~1/sqrt(32) * per-sample rel std

    def loss_fused(q, k, v):
        return jnp.sum(bucket_graph_attention(
            bg, q, k, v, dropout_rate=0.3, dropout_rng=key) ** 2)

    def loss_auto(q, k, v):
        # layout without transpose -> plain XLA autodiff on same masked fwd
        return jnp.sum(bucket_graph_attention(
            bg_nt, q, k, v, dropout_rate=0.3, dropout_rng=key) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    ga = jax.grad(loss_auto, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, ga):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_bucket_dropout_blocked_matches_flat(rng):
    """The layout-invariant edge hash makes blocked and flat layouts drop
    the same edges (col_base rebasing)."""
    g = _small_graph(rng, n=3000, e=24000)
    n = g.n_nodes
    bgb = formats.preprocess("bucketed_train", g, src_block_rows=1024,
                             split_width=64).device_put()
    bgf = formats.preprocess("bucketed_train", g, src_block_rows=None,
                             split_width=64).device_put()
    q, k, v = (jnp.asarray(rng.standard_normal((n, 1, 8)).astype(np.float32))
               for _ in range(3))
    key = jax.random.key(9)
    ob = bucket_graph_attention(bgb, q, k, v, dropout_rate=0.3, dropout_rng=key)
    of = bucket_graph_attention(bgf, q, k, v, dropout_rate=0.3, dropout_rng=key)
    np.testing.assert_allclose(np.asarray(ob), np.asarray(of),
                               rtol=1e-4, atol=1e-5)


def test_flash_dropout_matches_masked_reference(rng):
    """Flash-kernel in-kernel dropout: forward and custom backward match a
    plain-jnp dense formulation applying the identical hash mask."""
    from dfgnn_tpu.ops.edge_dropout import keep_scale, seed_from_key

    B, P, h, f = 8, 128, 2, 16
    graphs = []
    for _ in range(B):
        n = int(rng.integers(60, 120))
        e = n * 6
        graphs.append((rng.integers(0, n, e), rng.integers(0, n, e), n))
    batch = DenseBatch.from_graph_list(graphs, np_pad=P).device_put()
    q, k, v = (jnp.asarray(
        rng.standard_normal((B, P, h, f)).astype(np.float32))
        for _ in range(3))
    key = jax.random.key(7)
    rate = 0.4
    seed = seed_from_key(key)

    gg = jnp.arange(B)[:, None, None]
    r = gg * P + jnp.arange(P)[None, :, None]
    c = gg * P + jnp.arange(P)[None, None, :]
    ks = jnp.stack([keep_scale(seed, r, c, hh, rate) for hh in range(h)],
                   axis=1)

    NEG = -1e30

    def ref(q, k, v):
        s = jnp.einsum("brhf,bchf->bhrc", q, k)
        s = jnp.where(batch.adj[:, None], s, NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        ex = jnp.where(batch.adj[:, None], jnp.exp(s - jnp.maximum(m, NEG)), 0.0)
        den = jnp.sum(ex, axis=-1, keepdims=True)
        w = jnp.where(den > 0, ex / jnp.where(den > 0, den, 1.0), 0.0)
        return jnp.einsum("bhrc,bchf->brhf", w * ks, v)

    o_ref = ref(q, k, v)
    o_fl = flash_graph_attention(batch, q, k, v, dropout_rate=rate,
                                 dropout_rng=key)
    np.testing.assert_allclose(np.asarray(o_fl), np.asarray(o_ref),
                               rtol=1e-4, atol=1e-5)

    gr = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(lambda *a: jnp.sum(flash_graph_attention(
        batch, *a, dropout_rate=rate, dropout_rng=key) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-2)


def test_dropout_never_silent(rng):
    """Layouts without dropout support must raise, not ignore (VERDICT r1
    weak #1)."""
    from dfgnn_tpu.ops import graph_attention
    from dfgnn_tpu.data.sampling import NeighborSampler

    g = make_graph(rng, 60, 5)
    n = g.n_nodes
    v = jnp.asarray(rng.standard_normal((n, 1, 4)).astype(np.float32))
    blk = NeighborSampler(g).sample_layer(np.arange(8), fanout=4, seed=0)
    qs = jnp.asarray(rng.standard_normal(
        (blk.bg.n_nodes, 1, 4)).astype(np.float32))
    with pytest.raises(NotImplementedError):
        graph_attention(blk, qs, v, v,
                        dropout_rate=0.5, dropout_rng=jax.random.key(0))


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
