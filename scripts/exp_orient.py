#!/usr/bin/env python
"""R3 experiment: score-orientation variants for narrow buckets (scratch).

Hypothesis: the W-dependent per-row cost of the bucket path is VPU lane
waste — scores [C, h, W] put W in the 128-lane minor dim.  Variant B
computes scores as [h, W, C] (lanes = C, sublanes = W) so every softmax
op runs at full vreg occupancy.
"""
import os
import sys
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from dfgnn_tpu.utils.benchmark import benchmark_chained

    rng = np.random.default_rng(0)
    N = 81920
    HEADS, DIM = 1, 128
    E_TARGET = 4 << 20
    k = jnp.asarray(rng.standard_normal((N, HEADS, DIM)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((N, HEADS, DIM)).astype(np.float32))
    kv = jnp.concatenate([k, v], axis=-1)
    q = jnp.asarray(rng.standard_normal((N, HEADS, DIM)).astype(np.float32))
    NEG = -1e30

    def run_chunks(fn, nbr, emask, rid, chunk):
        n_chunks = nbr.shape[0] // chunk
        args = tuple(x.reshape((n_chunks, chunk) + x.shape[1:])
                     for x in (rid, nbr, emask))
        if n_chunks == 1:
            o, l = fn(tuple(a[0] for a in args))
            o, l = o[None], l[None]
        else:
            o, l = jax.lax.map(fn, args)
        o = o.reshape((-1,) + o.shape[2:])
        l = l.reshape((-1,) + l.shape[2:])
        return o + l[..., None]

    def chunk_a(args, f, q):
        rid, nbr, emask = args
        C, W = nbr.shape
        h = kv.shape[1]
        g = jnp.take(kv, nbr.reshape(-1), axis=0, mode="clip").reshape(C, W, h, 2 * f)
        k_n, v_n = g[..., :f], g[..., f:]
        q_c = jnp.take(q, rid, axis=0, mode="clip")
        s = jnp.einsum("chf,cwhf->chw", q_c, k_n)
        s = jnp.where(emask[:, None, :], s, NEG)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), NEG)
        ex = jnp.where(emask[:, None, :], jnp.exp(s - m), 0.0)
        den = jnp.sum(ex, axis=-1, keepdims=True)
        w = jnp.where(den > 0, ex / jnp.where(den > 0, den, 1.0), 0.0)
        out = jnp.einsum("chw,cwhf->chf", w, v_n)
        lse = jnp.where(den > 0, m + jnp.log(jnp.where(den > 0, den, 1.0)), NEG)
        return out, lse[..., 0]

    def chunk_b(args, f, q):
        rid, nbr, emask = args
        C, W = nbr.shape
        h = kv.shape[1]
        g = jnp.take(kv, nbr.reshape(-1), axis=0, mode="clip").reshape(C, W, h, 2 * f)
        k_n, v_n = g[..., :f], g[..., f:]
        q_c = jnp.take(q, rid, axis=0, mode="clip")
        # scores oriented [h, W, C]: lanes = C (full use), sublanes = W
        s = jnp.einsum("chf,cwhf->hwc", q_c, k_n)
        em = emask.T[None]                       # [1, W, C]
        s = jnp.where(em, s, NEG)
        m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), NEG)
        ex = jnp.where(em, jnp.exp(s - m), 0.0)
        den = jnp.sum(ex, axis=1, keepdims=True)
        w = jnp.where(den > 0, ex / jnp.where(den > 0, den, 1.0), 0.0)
        out = jnp.einsum("hwc,cwhf->chf", w, v_n)
        lse = jnp.where(den > 0, m + jnp.log(jnp.where(den > 0, den, 1.0)), NEG)
        return out, lse[:, 0, :].T

    for W in (8, 16, 32, 64, 128):
        n_rows = min(E_TARGET // W, N)
        nbr = rng.integers(0, N, size=(n_rows, W)).astype(np.int32)
        emask = np.ones((n_rows, W), bool)
        rid = np.arange(n_rows, dtype=np.int32)
        chunk = max(8, min((16 << 20) // (W * 1024), n_rows))
        while n_rows % chunk:
            chunk //= 2
        nbr_d, em_d, rid_d = map(jnp.asarray, (nbr, emask, rid))
        for label, fn in (("A chw", chunk_a), ("B hwc", chunk_b)):
            ms = benchmark_chained(
                lambda qq, nbr_d, em_d, rid_d, fn=fn: run_chunks(
                    functools.partial(fn, f=DIM, q=qq),
                    nbr_d, em_d, rid_d, chunk),
                q, nbr_d, em_d, rid_d, iters=8)
            rate = ms * 1e6 / (n_rows * W)
            print(f"W={W:4d} {label}: {ms:8.2f} ms  {rate:.2f} ns/row",
                  flush=True)

    # sanity: same numerics
    import numpy.testing as npt
    nbr = rng.integers(0, N, size=(64, 8)).astype(np.int32)
    em = np.ones((64, 8), bool); em[3, 4:] = False
    rid = np.arange(64, dtype=np.int32)
    a = chunk_a((jnp.asarray(rid), jnp.asarray(nbr), jnp.asarray(em)), DIM, q)
    b = chunk_b((jnp.asarray(rid), jnp.asarray(nbr), jnp.asarray(em)), DIM, q)
    npt.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=2e-5, atol=2e-5)
    npt.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), rtol=2e-5, atol=2e-5)
    print("numerics OK")


if __name__ == "__main__":
    main()
