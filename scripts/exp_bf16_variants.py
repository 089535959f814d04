#!/usr/bin/env python
"""(scratch) What binds the bf16 fused-layer kernel at ~0.22 ms?

exp_bf16_layer.py showed flash_fused ~0.221 ms vs an 80 MB byte floor of
~0.098 ms, G-insensitive, tied with XLA dense.  This isolates the
in-kernel stages by monkeypatching ``_softmax_matmul``:

  full        — production kernel (mask + fp32 softmax + aggregate)
  no-softmax  — mask + aggregate only (drops max/exp/sum/normalise VPU
                chain): the VPU-cost probe
  no-mask     — full softmax but no adjacency select (adj still DMA'd):
                the mask-select probe
  bf16-softmax— softmax chain computed in bf16 (half-width VPU ops where
                the VPU packs bf16)

Results recorded in NOTES_r4.md item 2.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dfgnn_tpu.data.synthetic import pattern_like_batch
    from dfgnn_tpu.graph import DenseBatch
    from dfgnn_tpu.models import make_conv
    from dfgnn_tpu.ops.pallas import flash_mask as fm
    from dfgnn_tpu.utils.benchmark import benchmark_chained_stats

    rng = np.random.default_rng(0)
    BS, DIM, HEADS = 1024, 128, 1
    graphs = [(r, c, n) for r, c, n, _ in pattern_like_batch(rng, BS)]
    batch = DenseBatch.from_graph_list(graphs, np_pad=128).device_put()
    x = jnp.asarray(
        rng.standard_normal((batch.n_graphs * batch.np_pad, DIM))
        .astype(np.float32)
    ).astype(jnp.bfloat16)

    layer16 = make_conv("gt", out_size=DIM, num_heads=HEADS, method="flash",
                        dtype=jnp.bfloat16)
    p16 = layer16.init(jax.random.key(0), batch, x)

    orig = fm._softmax_matmul

    def no_softmax(s, adj, v, o_ref, lse_ref, prec, seed_ref, rate, val=None):
        s = jnp.where(adj, s, 0.0)
        o = fm._bmm_nn(s.astype(v.dtype), v, prec) * (1.0 / 128.0)
        o_ref[:, 0, :, :] = o.astype(o_ref.dtype)

    def no_mask(s, adj, v, o_ref, lse_ref, prec, seed_ref, rate, val=None):
        m = jnp.max(s, axis=-1, keepdims=True)
        ex = jnp.exp(s - m)
        l = jnp.sum(ex, axis=-1, keepdims=True)
        inv = jnp.where(l > 0, 1.0 / jnp.where(l > 0, l, 1.0), 0.0)
        o = fm._bmm_nn(ex.astype(v.dtype), v, prec) * inv
        o_ref[:, 0, :, :] = o.astype(o_ref.dtype)

    def bf16_softmax(s, adj, v, o_ref, lse_ref, prec, seed_ref, rate,
                     val=None):
        s16 = jnp.where(adj, s, fm._NEG_BIG).astype(jnp.bfloat16)
        m = jnp.maximum(jnp.max(s16, axis=-1, keepdims=True),
                        jnp.bfloat16(-1e30 / 2))
        ex = jnp.exp(s16 - m)
        l = jnp.sum(ex.astype(jnp.float32), axis=-1, keepdims=True)
        inv = jnp.where(l > 0, 1.0 / jnp.where(l > 0, l, 1.0), 0.0)
        o = fm._bmm_nn(ex, v, prec) * inv
        o_ref[:, 0, :, :] = o.astype(o_ref.dtype)

    for name, impl_fn in (("full", orig), ("no-softmax", no_softmax),
                          ("no-mask", no_mask),
                          ("bf16-softmax", bf16_softmax)):
        fm._softmax_matmul = impl_fn
        try:
            ms, sp = benchmark_chained_stats(
                lambda x: layer16.apply(p16, batch, x, impl="flash_fused"),
                x, iters=100, reps=5)
            print(f"{name:>14}: {ms:7.3f} ms  (+-{sp:5.3f})", flush=True)
        finally:
            fm._softmax_matmul = orig


if __name__ == "__main__":
    main()
