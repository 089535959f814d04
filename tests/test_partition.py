"""Edge-partitioned distributed attention on the 8-device CPU mesh vs the
single-device oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfgnn_tpu.graph import Graph
from dfgnn_tpu.ops import graph_attention_reference
from dfgnn_tpu.parallel import make_mesh
from dfgnn_tpu.parallel.partition import partition_graph, dist_graph_attention
from helpers import make_graph, random_graph_coo


@pytest.mark.parametrize("n_dev", [2, 8])
def test_dist_dot_matches_oracle(rng, n_dev):
    n, h, f = 200, 2, 16
    g = make_graph(rng, n, 10)
    pg = partition_graph(g, n_dev)
    mesh = make_mesh(n_dev)
    q, k, v = (
        jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32)) for _ in range(3)
    )
    want = graph_attention_reference(g, q, k, v)
    got = dist_graph_attention(pg, mesh, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5)


def test_dist_add_matches_oracle(rng):
    n, h, f = 150, 1, 8
    g = make_graph(rng, n, 6)
    pg = partition_graph(g, 4)
    mesh = make_mesh(4)
    v = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
    er = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    ec = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    want = graph_attention_reference(g, None, None, v, score="add", e_row=er, e_col=ec)
    got = dist_graph_attention(pg, mesh, None, None, v, score="add", e_row=er, e_col=ec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5)


def test_dist_super_node(rng):
    """Super-node row on one device; its neighbors span all shards."""
    n, h, f = 400, 1, 8
    g = make_graph(rng, n, 4, super_node_deg=350)
    pg = partition_graph(g, 8)
    mesh = make_mesh(8)
    q, k, v = (
        jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32)) for _ in range(3)
    )
    want = graph_attention_reference(g, q, k, v)
    got = dist_graph_attention(pg, mesh, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5)


def test_dist_autodiff(rng):
    """Grad flows through shard_map + all_gather (psum_scatter transpose)."""
    n, h, f = 120, 1, 8
    g = make_graph(rng, n, 5)
    pg = partition_graph(g, 4)
    mesh = make_mesh(4)
    q, k, v = (
        jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32)) for _ in range(3)
    )
    t = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))

    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(graph_attention_reference(g, q, k, v) * t), (0, 1, 2)
    )(q, k, v)
    g_dist = jax.grad(
        lambda q, k, v: jnp.sum(dist_graph_attention(pg, mesh, q, k, v) * t), (0, 1, 2)
    )(q, k, v)
    for a, b in zip(g_dist, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_halo_exchange_matches_oracle(rng, n_dev):
    """Halo-compressed boundary exchange (all_to_all of needed rows only)
    vs the oracle, on a community-structured graph where the halo is small."""
    from dfgnn_tpu.data.synthetic import community_graph

    n, h, f = 240, 2, 8
    rows, cols = community_graph(rng, n, n_communities=n_dev, avg_deg=8)
    g = Graph.from_coo(rows, cols, n)
    pg = partition_graph(g, n_dev, halo=True)
    assert pg.halo is not None
    # locality: halo well under a full replica of each peer's rows
    assert pg.halo.max_halo < pg.n_local
    mesh = make_mesh(n_dev)
    q, k, v = (
        jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32)) for _ in range(3)
    )
    want = graph_attention_reference(g, q, k, v)
    got = dist_graph_attention(pg, mesh, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5)


def test_halo_exchange_add_and_autodiff(rng):
    """GAT-score halo path + grads through take -> all_to_all transpose."""
    n, h, f, n_dev = 160, 1, 8, 4
    g = make_graph(rng, n, 6)
    pg = partition_graph(g, n_dev, halo=True)
    mesh = make_mesh(n_dev)
    v = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
    er = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    ec = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    want = graph_attention_reference(g, None, None, v, score="add", e_row=er, e_col=ec)
    got = dist_graph_attention(pg, mesh, None, None, v, score="add", e_row=er, e_col=ec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5)

    t = jnp.asarray(rng.standard_normal(want.shape).astype(np.float32))
    gv_ref = jax.grad(
        lambda v: jnp.sum(graph_attention_reference(
            g, None, None, v, score="add", e_row=er, e_col=ec) * t)
    )(v)
    gv = jax.grad(
        lambda v: jnp.sum(dist_graph_attention(
            pg, mesh, None, None, v, score="add", e_row=er, e_col=ec) * t)
    )(v)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("halo", [False, True])
def test_dist_custom_backward(rng, halo):
    """Fused distributed backward (partition with_transpose=True): CSR-dir
    dQ on the destination partition + CSC-dir dK/dV on the source
    partition, matching oracle grads under both exchange modes."""
    n, h, f, n_dev = 240, 2, 8, 4
    g = make_graph(rng, n, 6, super_node_deg=150)
    pg = partition_graph(g, n_dev, halo=halo, with_transpose=True)
    assert pg.transpose is not None
    mesh = make_mesh(n_dev)
    q, k, v = (
        jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32)) for _ in range(3)
    )
    t = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(dist_graph_attention(pg, mesh, q, k, v)),
        np.asarray(graph_attention_reference(g, q, k, v)),
        rtol=1e-3, atol=1e-5,
    )
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(graph_attention_reference(g, q, k, v) * t), (0, 1, 2)
    )(q, k, v)
    g_dist = jax.grad(
        lambda q, k, v: jnp.sum(dist_graph_attention(pg, mesh, q, k, v) * t), (0, 1, 2)
    )(q, k, v)
    for a, b in zip(g_dist, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_dist_custom_backward_add(rng):
    """GAT-score distributed fused backward (d e_row / d e_col / dV)."""
    n, h, f, n_dev = 160, 1, 8, 4
    g = make_graph(rng, n, 5)
    pg = partition_graph(g, n_dev, halo=True, with_transpose=True)
    mesh = make_mesh(n_dev)
    v = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
    er, ec = (jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
              for _ in range(2))
    t = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
    fr = lambda er, ec, v: jnp.sum(graph_attention_reference(
        g, None, None, v, score="add", e_row=er, e_col=ec) * t)
    fd = lambda er, ec, v: jnp.sum(dist_graph_attention(
        pg, mesh, None, None, v, score="add", e_row=er, e_col=ec) * t)
    for a, b in zip(jax.grad(fd, (0, 1, 2))(er, ec, v),
                    jax.grad(fr, (0, 1, 2))(er, ec, v)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_dist_segments_super_node(rng):
    """Partitioned layouts split super-wide rows into harmonized fixed-width
    segments (per-device shapes identical); fw + fused backward match."""
    n, h, f, n_dev = 400, 1, 8, 4
    g = make_graph(rng, n, 4, super_node_deg=300)
    pg = partition_graph(g, n_dev, halo=True, with_transpose=True)
    assert pg.segments is not None
    mesh = make_mesh(n_dev)
    q, k, v = (
        jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32)) for _ in range(3)
    )
    t = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(dist_graph_attention(pg, mesh, q, k, v)),
        np.asarray(graph_attention_reference(g, q, k, v)),
        rtol=1e-3, atol=1e-5,
    )
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(graph_attention_reference(g, q, k, v) * t), (0, 1, 2)
    )(q, k, v)
    g_dist = jax.grad(
        lambda q, k, v: jnp.sum(dist_graph_attention(pg, mesh, q, k, v) * t), (0, 1, 2)
    )(q, k, v)
    for a, b in zip(g_dist, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("halo", [False, True])
def test_dist_dropout_matches_single_chip(rng, halo):
    """Distributed attention dropout (VERDICT r2 item 5): the edge hash is
    keyed on GLOBAL (dst, src) ids — local rows rebased by the device's row
    block, halo-remapped lanes inverted via table_global — so the dist
    output with dropout is bitwise the same mask as a single-chip bucketed
    run with the same seed, and the fused dist backward regenerates it."""
    from dfgnn_tpu import formats
    from dfgnn_tpu.ops.bucket import bucket_graph_attention

    n, h, f, n_dev = 240, 2, 8, 4
    g = make_graph(rng, n, 6, super_node_deg=150)
    pg = partition_graph(g, n_dev, halo=halo, with_transpose=True)
    mesh = make_mesh(n_dev)
    q, k, v = (
        jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
        for _ in range(3)
    )
    key = jax.random.key(11)
    rate = 0.4
    bg = formats.preprocess("bucketed_train", g, split_width=64).device_put()
    want = bucket_graph_attention(bg, q, k, v, dropout_rate=rate,
                                  dropout_rng=key)
    got = dist_graph_attention(pg, mesh, q, k, v, dropout_rate=rate,
                               dropout_rng=key)
    # same hash mask -> same edges dropped; only fp reduction order differs
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    # sanity: dropout actually changed the output
    o0 = dist_graph_attention(pg, mesh, q, k, v)
    assert float(jnp.max(jnp.abs(got - o0))) > 1e-3

    t = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
    g_flat = jax.grad(
        lambda q, k, v: jnp.sum(bucket_graph_attention(
            bg, q, k, v, dropout_rate=rate, dropout_rng=key) * t), (0, 1, 2)
    )(q, k, v)
    g_dist = jax.grad(
        lambda q, k, v: jnp.sum(dist_graph_attention(
            pg, mesh, q, k, v, dropout_rate=rate, dropout_rng=key) * t),
        (0, 1, 2)
    )(q, k, v)
    for a, b in zip(g_dist, g_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_dist_dropout_add_autodiff(rng):
    """GAT-score dist dropout on the non-transpose (XLA autodiff) path."""
    from dfgnn_tpu import formats
    from dfgnn_tpu.ops.bucket import bucket_graph_attention

    n, h, f, n_dev = 160, 1, 8, 4
    g = make_graph(rng, n, 6)
    pg = partition_graph(g, n_dev, halo=True)
    mesh = make_mesh(n_dev)
    v = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
    er, ec = (jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
              for _ in range(2))
    key = jax.random.key(3)
    bg = formats.preprocess("bucketed", g, split_width=64).device_put()
    want = bucket_graph_attention(bg, None, None, v, score="add", e_row=er,
                                  e_col=ec, dropout_rate=0.3, dropout_rng=key)
    got = dist_graph_attention(pg, mesh, None, None, v, score="add",
                               e_row=er, e_col=ec, dropout_rate=0.3,
                               dropout_rng=key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    t = jnp.asarray(rng.standard_normal(want.shape).astype(np.float32))
    gv = jax.grad(lambda v: jnp.sum(dist_graph_attention(
        pg, mesh, None, None, v, score="add", e_row=er, e_col=ec,
        dropout_rate=0.3, dropout_rng=key) * t))(v)
    gv_ref = jax.grad(lambda v: jnp.sum(bucket_graph_attention(
        bg, None, None, v, score="add", e_row=er, e_col=ec,
        dropout_rate=0.3, dropout_rng=key) * t))(v)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               rtol=1e-3, atol=1e-4)


def test_dist_under_jit_with_shardings(rng):
    """jit end-to-end with node-dim-sharded inputs."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, h, f = 160, 1, 8
    g = make_graph(rng, n, 5)
    n_dev = 8
    pg = partition_graph(g, n_dev)
    mesh = make_mesh(n_dev)
    n_pad = pg.n_local * pg.n_devices
    sh = NamedSharding(mesh, P("data"))

    def pad(x):
        return jnp.pad(x, [(0, n_pad - n), (0, 0), (0, 0)])

    q, k, v = (
        jax.device_put(
            pad(jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))), sh
        )
        for _ in range(3)
    )
    want = graph_attention_reference(g, q[:n], k[:n], v[:n])
    got = jax.jit(lambda q, k, v: dist_graph_attention(pg, mesh, q, k, v))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5)


def test_reorder_halo_community(rng):
    """Label-propagation reordering makes halo mode comm-efficient on community graphs
    (shuffled node ids) while outputs stay in original order and match the
    oracle (VERDICT r1 item 5)."""
    from dfgnn_tpu.data.synthetic import community_graph

    n, n_dev, h, f = 256, 4, 1, 8
    rows, cols = community_graph(np.random.default_rng(0), n, n_communities=4,
                                 avg_deg=8, intra_frac=0.95)
    # shuffle ids so contiguous blocking has NO locality without reordering
    shuf = np.random.default_rng(1).permutation(n)
    g = Graph.from_coo(shuf[rows], shuf[cols], n)
    mesh = make_mesh(n_dev)

    pg_plain = partition_graph(g, n_dev, mesh=mesh, halo=True)
    pg_bfs = partition_graph(g, n_dev, mesh=mesh, halo=True, reorder="lpa")
    # comm win: reordered halo must be much smaller than shuffled halo
    assert pg_bfs.halo.max_halo < pg_plain.halo.max_halo * 0.6, (
        pg_bfs.halo.max_halo, pg_plain.halo.max_halo)
    # and smaller than the all-gather equivalent
    assert pg_bfs.comm_rows_per_device() < (n_dev - 1) * pg_bfs.n_local

    q, k, v = (jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
               for _ in range(3))
    want = graph_attention_reference(g, q, k, v)
    got = dist_graph_attention(pg_bfs, mesh, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-5)

    # gradients flow through the permutation wrapper
    t = jnp.asarray(rng.standard_normal(want.shape).astype(np.float32))
    g_dist = jax.grad(lambda q: jnp.sum(dist_graph_attention(
        pg_bfs, mesh, q, k, v) * t))(q)
    g_ref = jax.grad(lambda q: jnp.sum(graph_attention_reference(
        g, q, k, v) * t))(q)
    np.testing.assert_allclose(np.asarray(g_dist), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)
