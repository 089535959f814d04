#!/usr/bin/env python
"""R3 experiment: decompose the W-dependent cost of the bucket chunk (scratch)."""
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
    kv = jnp.asarray(rng.standard_normal((N, HEADS, 2 * DIM)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((N, HEADS, DIM)).astype(np.float32))
    NEG = -1e30

    def run_chunks(fn, nbr, emask, rid, chunk):
        n_chunks = nbr.shape[0] // chunk
        args = tuple(x.reshape((n_chunks, chunk) + x.shape[1:])
                     for x in (rid, nbr, emask))
        if n_chunks == 1:
            o = fn(tuple(a[0] for a in args))[None]
        else:
            o = jax.lax.map(fn, args)
        return o.reshape((-1,) + o.shape[2:])

    def stage_gather(args, q, f):
        rid, nbr, emask = args
        C, W = nbr.shape
        h = kv.shape[1]
        g = jnp.take(kv, nbr.reshape(-1), axis=0, mode="clip").reshape(C, W, h, 2 * f)
        return jnp.sum(g, axis=(1, 3)) + q[0, 0, 0]   # [C, h]

    def stage_scores(args, q, f):
        rid, nbr, emask = args
        C, W = nbr.shape
        h = kv.shape[1]
        g = jnp.take(kv, nbr.reshape(-1), axis=0, mode="clip").reshape(C, W, h, 2 * f)
        k_n, v_n = g[..., :f], g[..., f:]
        q_c = jnp.take(q, rid, axis=0, mode="clip")
        s = jnp.einsum("chf,cwhf->chw", q_c, k_n)
        return jnp.sum(s, axis=-1) + jnp.sum(v_n, axis=(1, 3))

    def stage_agg_only(args, q, f):
        rid, nbr, emask = args
        C, W = nbr.shape
        h = kv.shape[1]
        g = jnp.take(kv, nbr.reshape(-1), axis=0, mode="clip").reshape(C, W, h, 2 * f)
        k_n, v_n = g[..., :f], g[..., f:]
        w = emask[:, None, :].astype(jnp.float32) * q[0, 0, 0]
        out = jnp.einsum("chw,cwhf->chf", w, v_n)
        return jnp.sum(out, axis=-1) + jnp.sum(k_n, axis=(1, 3))

    def stage_full(args, q, f):
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
        return jnp.sum(out, axis=-1)

    stages = [("gather+sum", stage_gather), ("-> +q,scores", stage_scores),
              ("-> gather+agg-einsum", stage_agg_only), ("full", stage_full)]
    for W in (8, 32, 128):
        n_rows = min(E_TARGET // W, N)
        nbr = rng.integers(0, N, size=(n_rows, W)).astype(np.int32)
        emask = np.ones((n_rows, W), bool)
        rid = np.arange(n_rows, dtype=np.int32)
        chunk = max(8, min((16 << 20) // (W * 1024), n_rows))
        while n_rows % chunk:
            chunk //= 2
        nbr_d, em_d, rid_d = map(jnp.asarray, (nbr, emask, rid))
        for label, fn in stages:
            ms = benchmark_chained(
                lambda qq, nbr_d, em_d, rid_d, fn=fn: run_chunks(
                    functools.partial(fn, f=DIM, q=qq),
                    nbr_d, em_d, rid_d, chunk),
                q, nbr_d, em_d, rid_d, iters=8)
            rate = ms * 1e6 / (n_rows * W)
            print(f"W={W:4d} {label:22s}: {ms:8.2f} ms  {rate:.2f} ns/row",
                  flush=True)


if __name__ == "__main__":
    main()
