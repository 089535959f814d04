#!/usr/bin/env python
"""Headline benchmark: fused GT attention conv, PATTERN-shaped batch.

Config mirrors the reference's canonical batched benchmark
(``bash/experiment/fig1_batch_graph.sh``: conv gt, dim 128, heads 1,
batch 1024, PATTERN) on synthetic SBM graphs matching PATTERN's measured
shape (~119 nodes, deg ~51), plus the per-conv-family sweep the reference
drives (conv in {gt, gat, agnn}, same script).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value = fused edges/s/chip and vs_baseline = speedup over the unfused
XLA segment-op oracle (the role DGL-sparse plays for the reference).

Stability protocol: every headline comparison row reports a MEDIAN over
>=5 independent differential measurements plus the min-max spread
(``benchmark_chained_stats``), so tunnel-latency jitter cannot pick the
winner between implementations ~10% apart.
"""

import json
import os
import sys

import numpy as np


def _stat(ms, spread):
    return {"ms": round(ms, 3), "spread_ms": round(spread, 3)}


def main():
    import jax
    import jax.numpy as jnp

    # DFGNN_TPU_PROFILE=1 wraps the headline fused call in a jax.profiler
    # trace (Perfetto), the reference's --profile bracket analog.
    profile = os.environ.get("DFGNN_TPU_PROFILE", "") not in ("", "0")

    from dfgnn_tpu.data.synthetic import pattern_like_batch
    from dfgnn_tpu.graph import DenseBatch, Graph
    from dfgnn_tpu.models import make_conv
    from dfgnn_tpu.utils.benchmark import benchmark_chained_stats

    rng = np.random.default_rng(0)
    BS, DIM, HEADS = 1024, 128, 1

    graphs = [(r, c, n) for r, c, n, _ in pattern_like_batch(rng, BS)]
    batch = DenseBatch.from_graph_list(graphs, np_pad=128).device_put()
    n_flat = batch.n_graphs * batch.np_pad
    x = jnp.asarray(rng.standard_normal((n_flat, DIM)).astype(np.float32))

    layer = make_conv("gt", out_size=DIM, num_heads=HEADS, method="flash")
    params = layer.init(jax.random.key(0), batch, x)
    if profile:
        from dfgnn_tpu.utils.profiling import profile_region

        with profile_region("bench_flash_batch"):
            jax.block_until_ready(layer.apply(params, batch, x))
    fused_ms, fused_spread = benchmark_chained_stats(
        lambda x: layer.apply(params, batch, x), x, iters=60, reps=5
    )
    fused_eps = batch.n_edges / (fused_ms / 1e3)

    # bf16 inference, all implementations reported transparently:
    #   flash       = decomposed projections + masked flash Pallas kernel
    #   dense       = XLA's dense masked formulation of the whole layer
    #   flash_fused = whole layer (QKV proj + attention) in ONE Pallas call
    detail = {}

    def bf16_sweep(conv, key):
        layer16 = make_conv(conv, out_size=DIM, num_heads=HEADS,
                            method="flash", dtype=jnp.bfloat16)
        p16 = layer16.init(jax.random.key(0), batch, x)
        impls = ("flash", "dense", "flash_fused") if conv in ("gt", "gat") \
            else ("flash", "dense")
        by_impl, by_spread = {}, {}
        for impl in impls:
            ms, sp = benchmark_chained_stats(
                lambda x, impl=impl: layer16.apply(p16, batch, x, impl=impl),
                x, iters=100, reps=5)
            by_impl[impl] = ms
            by_spread[impl] = sp
        best = min(by_impl, key=by_impl.get)
        detail[f"{key}_impl"] = best
        detail[f"{key}_ms"] = round(by_impl[best], 3)
        for impl in impls:
            detail[f"{key}_{impl}_ms"] = round(by_impl[impl], 3)
            detail[f"{key}_{impl}_spread_ms"] = round(by_spread[impl], 3)
        return by_impl[best]

    bf16_ms = bf16_sweep("gt", "bf16")
    bf16_gat_ms = bf16_sweep("gat", "gat_bf16")
    bf16_sweep("agnn", "agnn_bf16")

    # Unfused oracle on a subset (memory: O(E * dim) gathered temporaries),
    # compared by rate.
    SUB = 128
    sub_graphs = graphs[:SUB]
    sub_batch = DenseBatch.from_graph_list(sub_graphs, np_pad=128)
    g = sub_batch.to_graph().device_put()
    xs = x[: g.n_nodes]
    oracle_ms, oracle_spread = benchmark_chained_stats(
        lambda xs: layer.apply(params, g, xs, impl="reference"), xs,
        iters=5, reps=3,
    )
    detail["oracle_spread_ms"] = round(oracle_spread, 3)
    oracle_eps = g.n_edges / (oracle_ms / 1e3)

    # Second headline config (BASELINE.md): fused conv on a reddit-like
    # full graph (power-law, super-node rows) via the bucket/segment path.
    from dfgnn_tpu.data.datasets import load_full_graph
    from dfgnn_tpu.ops.bucket import bucket_graph_attention
    from dfgnn_tpu import formats

    # full scale: auto-selects the source-blocked layout (fast-gather
    # sub-tables; see formats.BlockedBucketedGraph)
    ds = load_full_graph("reddit", "data", scale=1.0)
    gf = Graph.from_coo(ds.rows, ds.cols, ds.n_nodes)
    bgf = formats.preprocess("bucketed", gf).device_put()
    qf, kf, vf = (
        jnp.asarray(rng.standard_normal((gf.n_nodes, HEADS, DIM)).astype(np.float32))
        for _ in range(3)
    )
    full_ms, full_spread = benchmark_chained_stats(
        lambda qf, kf, vf, bgf: bucket_graph_attention(bgf, qf, kf, vf),
        qf, kf, vf, bgf, iters=5, reps=3,
    )
    full_eps = gf.n_edges / (full_ms / 1e3)

    # Full-graph training step: forward + fused custom backward (the
    # flagship custom_vjp path; reference timing protocol analog:
    # train_full_graph_timing.py:185-201 measures fw and fw+bw splits).
    bgt = formats.preprocess("bucketed_train", gf).device_put()

    def fwbw(qf, kf, vf, bgt):
        def loss(q, k, v):
            out = bucket_graph_attention(bgt, q, k, v)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        _, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(qf, kf, vf)
        return grads[0]

    fwbw_ms, fwbw_spread = benchmark_chained_stats(
        fwbw, qf, kf, vf, bgt, iters=4, reps=3,
    )
    fwbw_eps = gf.n_edges / (fwbw_ms / 1e3)

    # GAT (add-score) and AGNN full-graph rows: the add-score chunk
    # functions + their CSC-direction backward get regression-visible TPU
    # numbers on the same reddit stand-in (the reference's full-graph
    # sweep covers all three convs, test_full_graph.py:121-130).
    erf, ecf = (
        jnp.asarray(rng.standard_normal((gf.n_nodes, HEADS)).astype(np.float32))
        for _ in range(2)
    )
    gat_full_ms, gat_full_spread = benchmark_chained_stats(
        lambda er, ec, vf, bgf: bucket_graph_attention(
            bgf, None, None, vf, score="add", e_row=er, e_col=ec),
        erf, ecf, vf, bgf, iters=5, reps=3,
    )

    def gat_fwbw(er, ec, vf, bgt):
        def loss(er_, ec_, v_):
            out = bucket_graph_attention(bgt, None, None, v_, score="add",
                                         e_row=er_, e_col=ec_)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        _, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(er, ec, vf)
        return grads[2]

    gat_fwbw_ms, gat_fwbw_spread = benchmark_chained_stats(
        gat_fwbw, erf, ecf, vf, bgt, iters=4, reps=3,
    )

    # AGNN reuses the dot kernels with q = k = l2norm(h) (the reference's
    # agnn_layer_fused.py:15-27 design); the normalize runs in XLA.
    hnf = vf / jnp.maximum(jnp.linalg.norm(vf, axis=-1, keepdims=True), 1e-12)
    agnn_full_ms, agnn_full_spread = benchmark_chained_stats(
        lambda hn, vf, bgf: bucket_graph_attention(bgf, hn, hn, vf),
        hnf, vf, bgf, iters=5, reps=3,
    )

    detail.update(
        {
            "fused_ms_per_batch": round(fused_ms, 3),
            "fused_spread_ms": round(fused_spread, 3),
            "bf16_ms_per_batch": round(bf16_ms, 3),
            "bf16_edges_per_s": round(batch.n_edges / (bf16_ms / 1e3)),
            "gat_bf16_edges_per_s": round(batch.n_edges / (bf16_gat_ms / 1e3)),
            "oracle_ms_per_subbatch": round(oracle_ms, 3),
            "oracle_edges_per_s": round(oracle_eps),
            "n_edges": batch.n_edges,
            "full_graph_reddit_edges_per_s": round(full_eps),
            "full_graph_ms": round(full_ms, 3),
            "full_graph_spread_ms": round(full_spread, 3),
            "full_graph_fwbw_ms": round(fwbw_ms, 3),
            "full_graph_fwbw_spread_ms": round(fwbw_spread, 3),
            "full_graph_fwbw_edges_per_s": round(fwbw_eps),
            "gat_full_graph_ms": round(gat_full_ms, 3),
            "gat_full_graph_spread_ms": round(gat_full_spread, 3),
            "gat_full_graph_edges_per_s": round(gf.n_edges / (gat_full_ms / 1e3)),
            "gat_full_graph_fwbw_ms": round(gat_fwbw_ms, 3),
            "gat_full_graph_fwbw_spread_ms": round(gat_fwbw_spread, 3),
            "gat_full_graph_fwbw_edges_per_s": round(gf.n_edges / (gat_fwbw_ms / 1e3)),
            "agnn_full_graph_ms": round(agnn_full_ms, 3),
            "agnn_full_graph_spread_ms": round(agnn_full_spread, 3),
            "agnn_full_graph_edges_per_s": round(gf.n_edges / (agnn_full_ms / 1e3)),
            "full_graph_n_edges": gf.n_edges,
            "backend": jax.default_backend(),
        }
    )
    print(
        json.dumps(
            {
                "metric": "fused GT conv edges/s/chip (PATTERN-like bs=1024 dim=128)",
                "value": round(fused_eps),
                "unit": "edges/s",
                "vs_baseline": round(fused_eps / oracle_eps, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
