"""Attention graph-conv layers (flax.linen).

The four conv families of the reference, each a thin parameterisation of the
shared fused attention-aggregate op (:func:`dfgnn_tpu.ops.graph_attention`):

* :class:`GTConv`    — sparse scaled-dot MHA (ref ``SparseMHA``,
  ``DFGNN/layers/GT/gtconv_layer.py:5-33``)
* :class:`GATConv`   — additive attention (ref ``GATConvDGL``,
  ``DFGNN/layers/GAT/gatconv_layer.py:6-38``)
* :class:`AGNNConv`  — cosine attention via the dot path with normalised
  features (ref ``AGNNConvDGL``, ``DFGNN/layers/AGNN/agnn_layer.py:6-19``)
* :class:`DotGATConv`— dot-product GAT, Q=K=V=fc(h) (ref ``GAT_DOT`` layers,
  ``DFGNN/layers/GAT_DOT/dotgatconv_layer_hyper.py:8-31``)

Unlike the reference (one class per (conv, CUDA-format) pair — ~30 classes),
the strategy here is picked by the *graph layout type* passed in; ``method``
forces a specific path (``"reference"`` = unfused oracle, the reference's
``fuse=False``).

Features are always node-flat ``[n_total, d]``; for a :class:`DenseBatch`
the flat order is graph-major (``b * np_pad + i``) and layers reshape
internally.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dfgnn_tpu.graph import DenseBatch
from dfgnn_tpu.ops import graph_attention


def _split_heads(x: jax.Array, g, heads: int) -> jax.Array:
    """[n, heads*f] -> [n, heads, f] (flat) or [B, P, heads, f] (dense)."""
    if isinstance(g, DenseBatch):
        return x.reshape(g.n_graphs, g.np_pad, heads, -1)
    return x.reshape(x.shape[0], heads, -1)


def _merge_heads(out: jax.Array, g) -> jax.Array:
    if isinstance(g, DenseBatch):
        b, p, h, f = out.shape
        return out.reshape(b * p, h * f)
    n, h, f = out.shape
    return out.reshape(n, h * f)


class _ProjParams(nn.Module):
    """Parameter-only stand-in for :class:`nn.Dense`: registers the same
    ``{kernel, bias}`` tree (same names, shapes, inits) but returns the raw
    parameters instead of computing ``x @ W`` — the fused-layer kernel does
    the projection itself (see ``flash_layer_attention``)."""

    features: int
    in_features: int
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return kernel, bias


def _auto_bf16_dense_batch(conv: str, g, out_size: int) -> str:
    """Measured-winner routing for bf16 ``method="auto"`` on a DenseBatch.

    Encodes the r5 shmoo crossovers (``results/shmoo_{gt,agnn}.json``,
    real v5e): XLA dense wins small workloads; the one-kernel fused layer
    wins GT at large token counts (bs=2048: 0.588 vs dense 0.847 ms,
    1.44x); the flash kernel wins at wide dims (dim=256) and AGNN at
    scale (bs=2048: 0.757 vs 0.933).  Thresholds sit between the measured
    grid points (131k/262k tokens; dims 128/256).
    """
    n_tokens = g.n_graphs * g.np_pad
    if conv == "gt":
        if n_tokens >= 200_000 and g.val is None:
            return "flash_fused"
        if out_size >= 192:
            return "flash"
        return "dense"
    # agnn: no fused-layer kernel (l2-normalize sits between proj + attn)
    if n_tokens >= 200_000 or out_size >= 192:
        return "flash"
    return "dense"


class GTConv(nn.Module):
    """Sparse multi-head scaled-dot attention (graph transformer conv).

    ``dtype=jnp.bfloat16`` runs projections and the attention kernel in
    bf16 (fp32 softmax/accumulation inside the kernel) — the TPU fast
    mode, ~2x memory bandwidth.  Default fp32 matches the reference's
    numerics bar.

    On a :class:`DenseBatch`, bf16 mode (or ``impl="flash_fused"``) runs
    the WHOLE layer — QKV projection + masked attention — as one Pallas
    kernel (``flash_layer_attention``), eliminating the q/k/v HBM
    round-trip; the parameter tree is identical to the decomposed path, so
    the two are checkpoint-compatible and switchable per call.
    """

    out_size: int
    num_heads: int = 1
    method: str = "auto"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, g, x, impl: Optional[str] = None):
        head_dim = self.out_size // self.num_heads
        if self.dtype is not None:
            x = x.astype(self.dtype)
        method = impl or self.method
        if method == "auto":
            # same ablation override the dispatcher honours
            import os

            method = os.environ.get("DFGNN_TPU_FORCE_METHOD", "auto")
        # bf16 auto on a DenseBatch: XLA dense is the measured winner at
        # the headline point (BENCH_r04: dense 0.252 ms vs flash_fused
        # 0.278 vs flash 0.315 at bs=1024 dim=128 — utilisation-bound
        # tie, NOTES_r4.md item 2), but the r5 shmoo
        # (results/shmoo_gt.json) found two real crossovers: at large
        # token counts the one-kernel fused layer wins (bs=2048:
        # 0.588 vs dense 0.847, 1.44x) and at wide dims the flash kernel
        # wins (dim=256: 0.133 vs 0.140).  Thresholds sit between the
        # measured grid points.
        if (method == "auto" and self.dtype == jnp.bfloat16
                and isinstance(g, DenseBatch)):
            method = _auto_bf16_dense_batch("gt", g, self.out_size)
        fused_layer = (
            isinstance(g, DenseBatch) and g.val is None
            and method == "flash_fused")
        if fused_layer:
            from dfgnn_tpu.ops.pallas.flash_mask import flash_layer_attention

            din = x.shape[-1]
            wq, bq = _ProjParams(self.out_size, din, name="q_proj")()
            wk, bk = _ProjParams(self.out_size, din, name="k_proj")()
            wv, bv = _ProjParams(self.out_size, din, name="v_proj")()
            return flash_layer_attention(
                g, x, wq, bq, wk, bk, wv, bv,
                num_heads=self.num_heads, scale=head_dim ** -0.5)
        q = nn.Dense(self.out_size, name="q_proj", dtype=self.dtype)(x) * (head_dim ** -0.5)
        k = nn.Dense(self.out_size, name="k_proj", dtype=self.dtype)(x)
        v = nn.Dense(self.out_size, name="v_proj", dtype=self.dtype)(x)
        out = graph_attention(
            g,
            _split_heads(q, g, self.num_heads),
            _split_heads(k, g, self.num_heads),
            _split_heads(v, g, self.num_heads),
            score="dot",
            method=method,
        )
        return _merge_heads(out, g)


class GATConv(nn.Module):
    """Additive-attention conv: score = LeakyReLU(a_l.Wh_row + a_r.Wh_col).

    ``dropout`` applies attention-weight dropout in training
    (``deterministic=False``), matching the reference's fused-GAT edge
    dropout (``fused_gatconv_kernel.cu:101-110``).
    """

    out_size: int
    num_heads: int = 1
    negative_slope: float = 0.2
    dropout: float = 0.0
    method: str = "auto"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, g, x, impl: Optional[str] = None, deterministic: bool = True):
        # reference: xavier_normal_ with relu gain sqrt(2) -> variance 2.0
        xavier_relu = nn.initializers.variance_scaling(2.0, "fan_avg", "normal")
        if self.dtype is not None:
            x = x.astype(self.dtype)
        method = impl or self.method
        if method == "auto":
            import os

            method = os.environ.get("DFGNN_TPU_FORCE_METHOD", "auto")
        rate0 = 0.0 if deterministic else self.dropout
        fused_layer = (
            isinstance(g, DenseBatch) and g.val is None
            and (method == "flash_fused"
                 or (method == "auto" and self.dtype == jnp.bfloat16)))
        if fused_layer:
            # whole layer (W proj + a_l/a_r scoring + attention + dropout)
            # in ONE Pallas kernel; parameter tree identical to the
            # decomposed path below (checkpoint-compatible).
            # Kept as the bf16 auto default on measurement (BENCH_r04:
            # fused-layer 0.283 ms == decomposed flash 0.282 within
            # spread; XLA dense loses 2.15x at 0.607 — the additive-score
            # broadcast does not fuse the way GT's QKV matmuls do).
            # The r5 shmoo (results/shmoo_gat.json) confirms dense loses
            # at EVERY grid point; fused-layer vs decomposed flash trade
            # within a ±40% band with no monotone pattern (fused wins
            # small dims/batches and ties the bs=1024 headline; flash
            # wins bs=512/2048) — fused stays the default for its
            # single-kernel in-kernel dropout; impl="flash" remains one
            # call away.
            from dfgnn_tpu.ops.pallas.flash_mask import (
                flash_layer_attention_gat,
            )

            w, b = _ProjParams(self.out_size * self.num_heads, x.shape[-1],
                               kernel_init=xavier_relu, name="W")()
            a_l = self.param("a_l", xavier_relu,
                             (self.out_size, self.num_heads))
            a_r = self.param("a_r", xavier_relu,
                             (self.out_size, self.num_heads))
            return flash_layer_attention_gat(
                g, x, w, b, a_l, a_r, num_heads=self.num_heads,
                negative_slope=self.negative_slope, dropout_rate=rate0,
                dropout_rng=(self.make_rng("dropout") if rate0 > 0.0
                             else None))
        z = nn.Dense(
            self.out_size * self.num_heads,
            name="W",
            use_bias=True,
            kernel_init=xavier_relu,
            dtype=self.dtype,
        )(x)
        a_l = self.param("a_l", xavier_relu, (self.out_size, self.num_heads))
        a_r = self.param("a_r", xavier_relu, (self.out_size, self.num_heads))
        zh = z.reshape(z.shape[0], self.num_heads, self.out_size)
        # e_l / e_r: per-node per-head scalars (ref gatconv_layer.py:33-34)
        e_l = jnp.einsum("nhf,fh->nh", zh, a_l)
        e_r = jnp.einsum("nhf,fh->nh", zh, a_r)
        if isinstance(g, DenseBatch):
            b, p = g.n_graphs, g.np_pad
            e_l = e_l.reshape(b, p, self.num_heads)
            e_r = e_r.reshape(b, p, self.num_heads)
        rate = rate0
        rng = self.make_rng("dropout") if rate > 0.0 else None
        out = graph_attention(
            g,
            None,
            None,
            _split_heads(z, g, self.num_heads),
            score="add",
            e_row=e_l,
            e_col=e_r,
            negative_slope=self.negative_slope,
            dropout_rate=rate,
            dropout_rng=rng,
            method=impl or self.method,
        )
        return _merge_heads(out, g)


class AGNNConv(nn.Module):
    """Cosine-similarity attention: Q=K=l2norm(h), V=h, via the dot path.

    Mirrors the reference where all fused AGNN variants reuse the GT kernels
    with normalised features (``agnn_layer_fused.py:15-27``); the projection
    is applied first, as in ``AGNNConvDGL.proj``.
    """

    out_size: int
    num_heads: int = 1
    project: bool = True
    method: str = "auto"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, g, x, impl: Optional[str] = None):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = (nn.Dense(self.out_size, name="proj", dtype=self.dtype)(x)
             if self.project else x)
        hn = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
        method = impl or self.method
        if method == "auto":
            # resolve the global ablation override BEFORE the bf16-auto
            # rewrite (as GTConv does), so DFGNN_TPU_FORCE_METHOD is
            # honoured here too
            import os

            method = os.environ.get("DFGNN_TPU_FORCE_METHOD", "auto")
        # bf16 auto on a DenseBatch: XLA dense wins at the headline point
        # (BENCH_r04: 0.256 ms dense vs 0.289 flash) — same utilisation-
        # bound story as GTConv — but the r5 shmoo
        # (results/shmoo_agnn.json) flips to flash at scale (bs=2048:
        # 0.757 vs dense 0.933) and at wide dims (dim=256: 0.099 vs
        # 0.114); thresholds sit between the measured grid points.
        if (method == "auto" and self.dtype == jnp.bfloat16
                and isinstance(g, DenseBatch)):
            method = _auto_bf16_dense_batch("agnn", g, self.out_size)
        out = graph_attention(
            g,
            _split_heads(hn, g, self.num_heads),
            _split_heads(hn, g, self.num_heads),
            _split_heads(h, g, self.num_heads),
            score="dot",
            method=method,
        )
        return _merge_heads(out, g)


class DotGATConv(nn.Module):
    """Dot-product GAT: Q = K = V = fc(h)."""

    out_size: int
    num_heads: int = 1
    method: str = "auto"

    @nn.compact
    def __call__(self, g, x, impl: Optional[str] = None):
        z = nn.Dense(self.out_size, name="fc")(x)
        zh = _split_heads(z, g, self.num_heads)
        out = graph_attention(g, zh, zh, zh, score="dot", method=impl or self.method)
        return _merge_heads(out, g)


_CONVS = {"gt": GTConv, "gat": GATConv, "agnn": AGNNConv, "dotgat": DotGATConv}


def make_conv(conv: str, out_size: int, num_heads: int = 1, **kw) -> nn.Module:
    """String-keyed conv factory (parity with ``load_graphconv_layer``,
    ``DFGNN/layers/util.py:446-455`` — plus the ``dotgat`` branch the
    reference's dispatch is missing)."""
    try:
        cls = _CONVS[conv]
    except KeyError:
        raise KeyError(f"unknown conv {conv!r}; choose from {sorted(_CONVS)}")
    return cls(out_size=out_size, num_heads=num_heads, **kw)
