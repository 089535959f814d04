#!/usr/bin/env python
"""R3 experiment: mul+reduce vs dot einsums for narrow buckets (scratch)."""
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

    def full(args, q, f, mode):
        rid, nbr, emask = args
        C, W = nbr.shape
        h = kv.shape[1]
        g = jnp.take(kv, nbr.reshape(-1), axis=0, mode="clip").reshape(C, W, h, 2 * f)
        k_n, v_n = g[..., :f], g[..., f:]
        q_c = jnp.take(q, rid, axis=0, mode="clip")
        if mode == "dot":
            s = jnp.einsum("chf,cwhf->chw", q_c, k_n)
        else:
            s = jnp.sum(q_c[:, None, :, :] * k_n, axis=-1)    # [C, W, h]
            s = s.transpose(0, 2, 1)
        s = jnp.where(emask[:, None, :], s, NEG)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), NEG)
        ex = jnp.where(emask[:, None, :], jnp.exp(s - m), 0.0)
        den = jnp.sum(ex, axis=-1, keepdims=True)
        w = jnp.where(den > 0, ex / jnp.where(den > 0, den, 1.0), 0.0)
        if mode == "dot":
            out = jnp.einsum("chw,cwhf->chf", w, v_n)
        else:
            out = jnp.sum(w.transpose(0, 2, 1)[..., None] * v_n, axis=1)
        return out

    for W in (8, 16, 32, 64):
        n_rows = min(E_TARGET // W, N)
        nbr = rng.integers(0, N, size=(n_rows, W)).astype(np.int32)
        emask = np.ones((n_rows, W), bool)
        rid = np.arange(n_rows, dtype=np.int32)
        chunk = max(8, min((16 << 20) // (W * 1024), n_rows))
        while n_rows % chunk:
            chunk //= 2
        nbr_d, em_d, rid_d = map(jnp.asarray, (nbr, emask, rid))
        for mode in ("dot", "mulred"):
            ms = benchmark_chained(
                lambda qq, nbr_d, em_d, rid_d, mode=mode: run_chunks(
                    functools.partial(full, f=DIM, q=qq, mode=mode),
                    nbr_d, em_d, rid_d, chunk),
                q, nbr_d, em_d, rid_d, iters=8)
            rate = ms * 1e6 / (n_rows * W)
            print(f"W={W:4d} {mode:7s}: {ms:8.2f} ms  {rate:.2f} ns/row",
                  flush=True)
    # numerics
    nbr = rng.integers(0, N, size=(64, 8)).astype(np.int32)
    em = np.ones((64, 8), bool); em[3, 4:] = False
    rid = np.arange(64, dtype=np.int32)
    a = full((jnp.asarray(rid), jnp.asarray(nbr), jnp.asarray(em)), q, DIM, "dot")
    b = full((jnp.asarray(rid), jnp.asarray(nbr), jnp.asarray(em)), q, DIM, "mulred")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)
    print("numerics OK")


if __name__ == "__main__":
    main()
