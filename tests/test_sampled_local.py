"""Localized sampled blocks: block-local feature flow, O(batch*fanout) step.

Guards the fix for the full-size-scatter defect: a sampled training step
must never materialize a full-graph-sized intermediate (the old
formulation scattered every layer's output into an ``[n+1, hidden]``
buffer, making mini-batch cost O(n))."""

import jax
import jax.numpy as jnp
import numpy as np

from dfgnn_tpu.data.sampling import NeighborSampler, sampled_block_attention
from helpers import make_graph


def _run_localized(blocks, x_sup, qkv):
    """Chain localized blocks input-first; qkv[li] = (q?, k?, v?) weights
    are identity here — features pass straight through attention."""
    h = x_sup
    for blk in reversed(blocks):
        hh = h[:, None, :]  # [rows, 1, f]
        out = sampled_block_attention(blk, hh, hh, hh)
        h = out[:, 0, :]
    return h


def test_localized_matches_global(rng):
    """Localized-index blocks compute the same values as the global-id
    formulation (features scattered to a full buffer between layers)."""
    n, f = 200, 8
    g = make_graph(rng, n, 6, zero_deg_frac=0.0)
    sampler = NeighborSampler(g)
    seeds = np.arange(0, 128)
    fanouts = [4, 4]
    pad_to = [128, 128 * 5]
    support_pad = 128 * 5 * 5
    x = rng.standard_normal((n, f)).astype(np.float32)

    # global formulation (the old path): full-size buffers between layers
    blocks_g = sampler.sample(seeds, fanouts, seed=3, pad_to=pad_to)
    h = jnp.asarray(x)
    for blk in reversed(blocks_g):
        hh = h[:, None, :]
        out = sampled_block_attention(blk, hh, hh, hh)[:, 0, :]
        buf = jnp.zeros((n + 1, f), h.dtype)
        h = buf.at[blk.seeds].set(out, mode="drop")[:n]
    want = np.asarray(h)[seeds]

    # localized formulation: all tensors O(batch * fanout)
    blocks_l, sup = sampler.sample_localized(
        seeds, fanouts, seed=3, pad_to=pad_to, support_pad=support_pad)
    x_pad = jnp.concatenate([jnp.asarray(x), jnp.zeros((1, f))], 0)
    x_sup = jnp.take(x_pad, jnp.asarray(sup), axis=0, mode="clip")
    got = np.asarray(_run_localized(blocks_l, x_sup, None))[: len(seeds)]

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_localized_step_has_no_full_size_tensors(rng):
    """Every op output inside a localized step is O(batch*fanout): no
    intermediate's leading dim reaches n (the defining property the old
    full-buffer formulation violated)."""
    n, f = 5000, 8
    g = make_graph(rng, n, 6, zero_deg_frac=0.0)
    sampler = NeighborSampler(g)
    bs = 64
    fanouts = [4, 4]
    pad_to = [bs, bs * 5]
    support_pad = bs * 5 * 5
    blocks, sup = sampler.sample_localized(
        np.arange(bs), fanouts, seed=0, pad_to=pad_to,
        support_pad=support_pad)
    x_full = jnp.zeros((n + 1, f))

    def step(support):
        x_sup = jnp.take(x_full, support, axis=0, mode="clip")
        return _run_localized(blocks, x_sup, None)

    jaxpr = jax.make_jaxpr(step)(jnp.asarray(sup))
    big = []

    def scan_eqns(jxp):
        for eqn in jxp.eqns:
            for sub in jax.core.jaxprs_in_params(eqn.params):
                scan_eqns(sub)
            for v in eqn.outvars:
                shape = getattr(v.aval, "shape", ())
                if shape and shape[0] >= n:
                    big.append((eqn.primitive.name, shape))

    scan_eqns(jaxpr.jaxpr)
    assert not big, f"full-graph-sized intermediates in sampled step: {big}"


def test_localized_truncation_masks_overflow(rng):
    """Support overflow is truncated, not mis-indexed: overflowing edges
    are masked out and outputs stay finite."""
    n, f = 300, 4
    g = make_graph(rng, n, 10, zero_deg_frac=0.0)
    sampler = NeighborSampler(g)
    bs = 32
    blocks, sup = sampler.sample_localized(
        np.arange(bs), [8, 8], seed=1, pad_to=[bs, bs * 2],
        support_pad=bs * 3)  # deliberately too small
    for blk in blocks:
        b = blk.bg.buckets[0]
        nbr = np.asarray(b.nbr)
        emask = np.asarray(b.emask)
        assert nbr[emask].max(initial=0) < sup.shape[0] + bs * 2
    x_sup = jnp.asarray(
        rng.standard_normal((sup.shape[0], f)).astype(np.float32))
    out = np.asarray(_run_localized(blocks, x_sup, None))
    assert np.isfinite(out).all()
