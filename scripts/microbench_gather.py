"""Microbenchmarks for the full-graph gather-attention design space (TPU).

Measures, on the real chip, the candidate mechanisms for the random
source-row gather at the heart of the full-graph fused attention path
(reference hot loop: ``DFGNN/src/fused_gtconv/fused_gtconv_tiling.cu:9-90``):

  stream        sequential HBM streaming rate (roofline reference)
  xla_fused     XLA row gather fused into one consuming contraction
  xla_mat       XLA row gather, materialised (512B and packed-1KB rows)
  pallas_dma    Pallas kernel, one double-buffered row DMA per gather
  pallas_take   Pallas kernel, take_along_axis from a VMEM-resident slab
  onehot_mxu    one-hot matmul gather from a VMEM slab (bf16 MXU)

All timings use benchmark_chained (differential, in-program loop) because
the remote-attached TPU path dedupes identical executions and adds ~10ms
dispatch jitter.

Run:  python scripts/microbench_gather.py
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfgnn_tpu.utils.benchmark import benchmark_chained


def report(name, ms, n_rows, row_bytes):
    ns = ms * 1e6 / n_rows
    gbs = n_rows * row_bytes / (ms * 1e-3) / 1e9
    print(f"{name:28s} {ms:9.3f} ms  {ns:7.2f} ns/row  {gbs:8.1f} GB/s",
          flush=True)


def stream(tbl):
    return tbl * 2.0


def xla_fused(tbl, idx, q):
    g = jnp.take(tbl, idx, axis=0)                 # [M, f]
    return jnp.einsum("mf,f->m", g, q)


def xla_mat(tbl, idx):
    return jnp.take(tbl, idx, axis=0)


# --------------------------------------------------------------------------
# Pallas per-row DMA gather
# --------------------------------------------------------------------------

def _dma_kernel(idx_ref, tbl_ref, out_ref, sems, *, chunk, lookahead):
    def dma(i):
        return pltpu.make_async_copy(
            tbl_ref.at[idx_ref[i]], out_ref.at[i],
            sems.at[i % (lookahead + 1)],
        )

    for i in range(lookahead):
        dma(i).start()

    def body(i, _):
        @pl.when(i + lookahead < chunk)
        def _():
            dma(i + lookahead).start()
        dma(i).wait()
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def make_pallas_dma(n_rows, f, chunk=512, lookahead=15):
    kern = functools.partial(_dma_kernel, chunk=chunk, lookahead=lookahead)

    def run(tbl, idx):
        return pl.pallas_call(
            kern,
            grid=(n_rows // chunk,),
            in_specs=[
                pl.BlockSpec((chunk,), lambda c: (c,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((chunk, f), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, f), tbl.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA((lookahead + 1,))],
        )(idx, tbl)

    return run


# --------------------------------------------------------------------------
# Pallas take_along_axis from VMEM slab
# --------------------------------------------------------------------------

def _take_kernel(idx_ref, tbl_ref, out_ref):
    f = tbl_ref.shape[-1]
    idx2 = jnp.broadcast_to(idx_ref[...][:, None], (idx_ref.shape[0], f))
    out_ref[...] = jnp.take_along_axis(tbl_ref[...], idx2, axis=0,
                                       mode="clip")


def make_pallas_take(n_rows, slab_rows, f, chunk=2048):
    def run(slab, idx):
        return pl.pallas_call(
            _take_kernel,
            grid=(n_rows // chunk,),
            in_specs=[
                pl.BlockSpec((chunk,), lambda c: (c,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((slab_rows, f), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((chunk, f), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, f), slab.dtype),
        )(idx, slab)

    return run


# --------------------------------------------------------------------------
# one-hot MXU gather from a slab
# --------------------------------------------------------------------------

def make_onehot(n_rows, slab_rows, f, chunk=1024, dtype=jnp.bfloat16):
    def run(slab, idx):
        slab = slab.astype(dtype)

        def one(_, ic):
            oh = (ic[:, None] == jnp.arange(slab_rows)[None, :]).astype(dtype)
            return None, jnp.dot(oh, slab, preferred_element_type=jnp.float32)

        _, out = jax.lax.scan(one, None, idx.reshape(-1, chunk))
        return out

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--table", type=int, default=1 << 18)
    ap.add_argument("--f", type=int, default=128)
    args = ap.parse_args()

    M, N, f = args.rows, args.table, args.f
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (N, f), jnp.float32)
    tbl2 = jax.random.normal(key, (N, 2 * f), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, N, jnp.int32)
    q = jax.random.normal(key, (f,), jnp.float32)
    print(f"table {N}x{f} fp32 = {N*f*4/1e6:.0f} MB; gathering {M} rows",
          flush=True)

    report("stream (x2 table)",
           benchmark_chained(stream, tbl) / 2, N, f * 4)
    report("xla_fused 512B",
           benchmark_chained(xla_fused, tbl, idx, q), M, f * 4)
    report("xla_mat 512B",
           benchmark_chained(xla_mat, tbl, idx), M, f * 4)
    report("xla_mat 1KB packed",
           benchmark_chained(xla_mat, tbl2, idx), M, 2 * f * 4)

    for chunk, la in ((256, 7), (512, 15), (1024, 31)):
        try:
            fn = make_pallas_dma(M, f, chunk=chunk, lookahead=la)
            report(f"pallas_dma c{chunk} la{la}",
                   benchmark_chained(fn, tbl, idx), M, f * 4)
        except Exception as e:
            print(f"pallas_dma c{chunk}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # slab-local variants: indices restricted to a resident slab
    for S in (512, 1024, 4096):
        idx_s = idx % S
        slab = tbl[:S]
        try:
            fn = make_pallas_take(M, S, f)
            report(f"pallas_take slab{S}",
                   benchmark_chained(fn, slab, idx_s), M, f * 4)
        except Exception as e:
            print(f"pallas_take slab{S}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        try:
            fn = make_onehot(M, S, f)
            report(f"onehot_mxu slab{S} bf16",
                   benchmark_chained(fn, slab, idx_s), M, f * 4)
        except Exception as e:
            print(f"onehot_mxu slab{S}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
