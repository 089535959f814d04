"""Head-sharded tensor parallelism on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from dfgnn_tpu import formats
from dfgnn_tpu.graph import DenseBatch
from dfgnn_tpu.ops import graph_attention
from dfgnn_tpu.parallel.tensor import (
    head_sharded_attention, make_tp_mesh, shard_params_tp,
)
from helpers import make_graph


def test_tp_heads_match_single_device(rng):
    n, h, f = 120, 4, 8
    g = make_graph(rng, n, 5).device_put()
    mesh = make_tp_mesh(2, 4)
    q, k, v = (jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
               for _ in range(3))
    want = graph_attention(g, q, k, v)
    got = head_sharded_attention(mesh, g, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_tp_heads_bucket_layout(rng):
    n, h, f = 200, 2, 8
    g = make_graph(rng, n, 6)
    bg = formats.preprocess("bucketed", g, split_width=32,
                            src_block_rows=None).device_put()
    mesh = make_tp_mesh(4, 2)
    q, k, v = (jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
               for _ in range(3))
    want = graph_attention(bg, q, k, v)
    got = head_sharded_attention(mesh, bg, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_tp_dense_batch_flash(rng):
    B, P_, h, f = 8, 128, 4, 16
    graphs = []
    for _ in range(B):
        nn_ = int(rng.integers(40, 100))
        graphs.append((rng.integers(0, nn_, nn_ * 4),
                       rng.integers(0, nn_, nn_ * 4), nn_))
    batch = DenseBatch.from_graph_list(graphs, np_pad=P_).device_put()
    mesh = make_tp_mesh(2, 4)
    q, k, v = (jnp.asarray(
        rng.standard_normal((B, P_, h, f)).astype(np.float32))
        for _ in range(3))
    want = graph_attention(batch, q, k, v)
    got = head_sharded_attention(mesh, batch, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_tp_param_sharding_end_to_end(rng):
    """GSPMD column-parallel projections + head-sharded conv: a jitted
    GTConv forward with TP-sharded params matches the replicated run."""
    from dfgnn_tpu.models import GTConv

    n, heads = 96, 4
    g = make_graph(rng, n, 5).device_put()
    x = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
    layer = GTConv(out_size=32, num_heads=heads)
    params = layer.init(jax.random.key(0), g, x)
    want = layer.apply(params, g, x)

    mesh = make_tp_mesh(2, 4)
    params_tp = shard_params_tp(params, mesh)
    got = jax.jit(lambda p, x: layer.apply(p, g, x))(params_tp, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
