#!/usr/bin/env python
"""(scratch) bf16 batched-layer decomposition: where do dense / flash /
flash_fused spend their time?  (VERDICT r3 item 2.)

Times, on the real chip with the median-of-5 stability protocol:
  * whole-layer implementations: dense | flash (decomposed) | flash_fused
  * stage pieces: projections only (XLA, 3 matmuls and 1 concatenated
    matmul), attention only (XLA dense masked softmax-matmul vs the flash
    Pallas kernel, given precomputed q/k/v)
  * flash_fused at forced graph-block sizes G (DFGNN_TPU_LAYER_G)

Results are recorded in NOTES_r4.md (item 2) — run, record, decide.
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
    from dfgnn_tpu.ops.dense_block import dense_graph_attention
    from dfgnn_tpu.ops.pallas.flash_mask import flash_graph_attention
    from dfgnn_tpu.utils.benchmark import benchmark_chained_stats

    rng = np.random.default_rng(0)
    BS, DIM, HEADS = 1024, 128, 1
    graphs = [(r, c, n) for r, c, n, _ in pattern_like_batch(rng, BS)]
    batch = DenseBatch.from_graph_list(graphs, np_pad=128).device_put()
    n_flat = batch.n_graphs * batch.np_pad
    x = jnp.asarray(
        rng.standard_normal((n_flat, DIM)).astype(np.float32)
    ).astype(jnp.bfloat16)

    layer16 = make_conv("gt", out_size=DIM, num_heads=HEADS, method="flash",
                        dtype=jnp.bfloat16)
    p16 = layer16.init(jax.random.key(0), batch, x)

    def row(name, fn, *args, iters=100):
        ms, sp = benchmark_chained_stats(fn, *args, iters=iters, reps=5)
        print(f"{name:>34}: {ms:7.3f} ms  (+-{sp:5.3f})", flush=True)
        return ms

    # --- whole layer ---
    for impl in ("dense", "flash", "flash_fused"):
        row(f"layer {impl}",
            lambda x, impl=impl: layer16.apply(p16, batch, x, impl=impl), x)

    # --- flash_fused G shmoo ---
    for g in (8, 16, 32, 64):
        os.environ["DFGNN_TPU_LAYER_G"] = str(g)
        try:
            row(f"layer flash_fused G={g}",
                lambda x: layer16.apply(p16, batch, x, impl="flash_fused"), x)
        except Exception as e:  # VMEM OOM at large G is informative too
            print(f"{'layer flash_fused G=' + str(g):>34}: FAILED "
                  f"({type(e).__name__})", flush=True)
        finally:
            del os.environ["DFGNN_TPU_LAYER_G"]

    # --- stage pieces ---
    wq = p16["params"]["q_proj"]["kernel"].astype(jnp.bfloat16)
    wk = p16["params"]["k_proj"]["kernel"].astype(jnp.bfloat16)
    wv = p16["params"]["v_proj"]["kernel"].astype(jnp.bfloat16)
    w3 = jnp.concatenate([wq, wk, wv], axis=1)  # [din, 3f]

    def proj3(x):
        return (x @ wq) + (x @ wk)[:, ::-1] + (x @ wv)  # consume all three

    def proj1(x):
        y = x @ w3
        return y[:, :DIM] + y[:, DIM:2 * DIM][:, ::-1] + y[:, 2 * DIM:]

    row("projections (3 matmuls)", proj3, x)
    row("projections (1 concat matmul)", proj1, x)

    B, P = batch.n_graphs, batch.np_pad
    q = (x @ wq).reshape(B, P, HEADS, DIM)
    k = (x @ wk).reshape(B, P, HEADS, DIM)
    v = (x @ wv).reshape(B, P, HEADS, DIM)

    row("attention only: XLA dense",
        lambda q: dense_graph_attention(batch, q, k, v), q)
    row("attention only: flash kernel",
        lambda q: flash_graph_attention(batch, q, k, v), q)

    # adjacency traffic probe: how much does the adj mask read cost alone?
    adj8 = batch.adj.astype(jnp.uint8)
    row("adj reduce (traffic probe)",
        lambda a: jnp.sum(a, dtype=jnp.int32), adj8, iters=200)


if __name__ == "__main__":
    main()
