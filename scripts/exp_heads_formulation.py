#!/usr/bin/env python
"""Why is the full-graph bucket walk 5.3x slower at heads=4 (dim 128
total) when MXU underutilization alone predicts <=4x?  (exp_heads.py:
full_gt_h1 109.9 ms vs full_gt_h4 584.3 ms; the gather side is
head-count-invariant, so the compute side is ~9.6x.)

Micro-benchmarks the per-chunk score+aggregate pipeline at a
representative shape (C=1024 rows, W=64 lanes) under candidate
formulations:

  a. current: einsum "chf,cwhf->chw" on the gathered [C,W,h,f] table
     (minor dim f=32 at h=4 — every op runs on quarter-filled lanes)
  b. per-head slices: h separate [C,W,f] einsums (no 4-D relayout)
  c. head-flattened scores via block-diagonal q: k_flat [C,W,h*f=128]
     contracted with q_bd [C, h*f, h] (K=128 full, N=h)
  d. h1 baseline at f=128 (equal FLOPs per edge)

Usage: python scripts/exp_heads_formulation.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dfgnn_tpu.utils.benchmark import benchmark_chained_stats

    rng = np.random.default_rng(0)
    C, W, H, F = 1024, 64, 4, 32
    D = H * F
    steps = 64  # chunk steps per timed call (scan-free: unrolled map)

    kv = jnp.asarray(rng.standard_normal((C, W, H, 2 * F)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((C, H, F)).astype(np.float32))
    kv1 = jnp.asarray(rng.standard_normal((C, W, 1, 2 * D)).astype(np.float32))
    q1 = jnp.asarray(rng.standard_normal((C, 1, D)).astype(np.float32))

    def softmax_agg(s, v_n):
        # [C,h,W] scores -> attention -> [C,h,f] out (the chunk tail)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        return jnp.einsum("chw,cwhf->chf", p, v_n)

    def run_a(kv, q):
        k_n, v_n = kv[..., :F], kv[..., F:]
        out = q
        for _ in range(steps):
            s = jnp.einsum("chf,cwhf->chw", out, k_n)
            out = softmax_agg(s, v_n)
        return out

    def run_b(kv, q):
        out = q
        for _ in range(steps):
            ss, os_ = [], []
            for h in range(H):
                k_h = kv[:, :, h, :F]
                v_h = kv[:, :, h, F:]
                s = jnp.einsum("cf,cwf->cw", out[:, h], k_h)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
                os_.append(jnp.einsum("cw,cwf->cf", p, v_h))
            out = jnp.stack(os_, axis=1)
        return out

    def run_c(kv, q):
        # k flattened to [C,W,D]; q as block-diag [C,D,H] so the score
        # contraction runs K=D=128 at N=H
        k_flat = kv[..., :F].reshape(C, W, D)
        v_n = kv[..., F:]
        eye = jnp.eye(H, dtype=q.dtype)                    # [H, H]
        out = q
        for _ in range(steps):
            q_bd = jnp.einsum("chf,hg->cfhg", out, eye).reshape(C, D, H)
            s = jnp.einsum("cwd,cdh->chw", k_flat, q_bd)
            out = softmax_agg(s, v_n)
        return out

    def run_d(kv1, q1):
        k_n, v_n = kv1[..., :D], kv1[..., D:]
        out = q1
        for _ in range(steps):
            s = jnp.einsum("chf,cwhf->chw", out, k_n)
            out = softmax_agg(s, v_n)
        return out

    lanes = C * W * steps
    for name, fn, a0, a1 in (("a_current_h4", run_a, kv, q),
                             ("b_perhead_h4", run_b, kv, q),
                             ("c_blockdiag_h4", run_c, kv, q),
                             ("d_baseline_h1", run_d, kv1, q1)):
        ms, sp = benchmark_chained_stats(fn, a0, a1, iters=30, reps=3)
        print(f"{name}: {ms:8.3f} ± {sp:.3f} ms   "
              f"{ms * 1e6 / lanes:.2f} ns/lane", flush=True)


if __name__ == "__main__":
    main()
