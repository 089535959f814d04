"""Native builder parity + neighborhood sampling."""

import numpy as np
import jax.numpy as jnp

from dfgnn_tpu import native
from dfgnn_tpu.data.sampling import NeighborSampler, sampled_block_attention
from dfgnn_tpu.graph import Graph
from dfgnn_tpu.ops import graph_attention_reference
from helpers import make_graph, random_graph_coo


def test_native_lib_loads():
    assert native.get_lib() is not None, "native library should build in CI"


def test_csr_from_coo_matches_numpy(rng):
    n = 50
    rows = rng.integers(0, n, 300)
    cols = rng.integers(0, n, 300)
    indptr, cols_s, perm = native.csr_from_coo(rows.astype(np.int64), cols.astype(np.int64), n)
    order = np.argsort(rows, kind="stable")
    np.testing.assert_array_equal(cols_s, cols[order])
    np.testing.assert_array_equal(perm, order)
    want_ip = np.zeros(n + 1, np.int64)
    np.add.at(want_ip, rows + 1, 1)
    np.testing.assert_array_equal(indptr, np.cumsum(want_ip))


def test_sample_layer_full_neighborhood_matches_oracle(rng):
    """fanout >= max degree: sampled attention == full attention on seeds."""
    n, h, f = 80, 1, 8
    g = make_graph(rng, n, 5)
    max_deg = int(np.asarray(g.degrees).max())
    sampler = NeighborSampler(g)
    seeds = np.arange(0, n, 2)
    blk = sampler.sample_layer(seeds, fanout=max_deg, seed=0)
    q, k, v = (jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32)) for _ in range(3))
    want = graph_attention_reference(g, q, k, v)
    got = sampled_block_attention(blk, q, k, v)
    np.testing.assert_allclose(
        np.asarray(got)[: len(seeds)], np.asarray(want)[seeds], rtol=1e-3, atol=1e-5
    )


def test_sample_layer_caps_fanout(rng):
    n = 60
    g = make_graph(rng, n, 12, zero_deg_frac=0.0)
    sampler = NeighborSampler(g)
    blk = sampler.sample_layer(np.arange(n), fanout=4, seed=1)
    b = blk.bg.buckets[0]
    nbrs = np.asarray(b.nbr)[:n]
    mask = np.asarray(b.emask)[:n]
    deg = np.asarray(g.degrees)
    assert (mask.sum(1) == np.minimum(deg, 4)).all()
    # sampled neighbors are real neighbors
    indptr = np.asarray(g.indptr)
    cols = np.asarray(g.cols)
    for i in range(0, n, 7):
        true_nbrs = set(cols[indptr[i]:indptr[i+1]].tolist())
        got = set(nbrs[i][mask[i]].tolist())
        assert got <= true_nbrs


def test_layered_sampling_frontier_grows(rng):
    n = 100
    g = make_graph(rng, n, 6, zero_deg_frac=0.0)
    sampler = NeighborSampler(g)
    blocks = sampler.sample(np.arange(10), [4, 4], seed=2)
    assert len(blocks) == 2
    assert blocks[1].n_seeds >= blocks[0].n_seeds
