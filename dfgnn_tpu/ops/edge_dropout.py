"""Stateless per-edge dropout mask, shared by all fused paths.

The reference fuses attention-weight dropout into the GAT training kernel
(``DFGNN/src/fused_gatconv/fused_gatconv_kernel.cu:101-110, 1073-1081``:
curand uniform per (edge, head), keep if ``mask > p``, scale by
``1/(1-p)``).  A TPU-native fused path cannot stash a curand state per
layout position, because the same edge is visited from *two* layouts (the
CSR-direction forward/backward and the CSC-direction backward) and the
mask must agree bitwise between them.

So the mask is a pure function of the edge identity: a murmur3-style
integer hash of ``(seed, dst, src, head)``.  It is:

* deterministic — forward and both backward directions regenerate the
  identical mask from the seed residual (no O(E) mask stash, unlike the
  reference's ``edge_mask[nnz, h]``);
* layout-invariant — bucket, segment, blocked and transposed layouts all
  key on the (dst, src) node pair;
* computable inside a Pallas kernel — uint32 VPU ops only.

Statistical quality: the murmur3 finalizer is a full-avalanche mixer;
three rounds over the three id components decorrelate adjacent edges far
beyond what Bernoulli dropout needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)
_P1 = np.uint32(0x9E3779B1)
_P2 = np.uint32(0x85EBCA77)
_P3 = np.uint32(0xC2B2AE3D)


def _mix(h):
    h = h ^ (h >> 16)
    h = h * _M1
    h = h ^ (h >> 13)
    h = h * _M2
    h = h ^ (h >> 16)
    return h


def seed_from_key(rng: jax.Array) -> jax.Array:
    """Derive the uint32 seed scalar from a jax PRNG key."""
    return jax.random.bits(rng, dtype=jnp.uint32)


def edge_hash(seed, dst, src, head) -> jax.Array:
    """uint32 hash over broadcastable int arrays (sentinel ids hash fine —
    their lanes are masked by ``emask``/adjacency downstream)."""
    h = jnp.asarray(seed, jnp.uint32)
    h = _mix(h ^ (jnp.asarray(dst).astype(jnp.uint32) * _P1))
    h = _mix(h ^ (jnp.asarray(src).astype(jnp.uint32) * _P2))
    h = _mix(h ^ (jnp.asarray(head).astype(jnp.uint32) * _P3))
    return h


def keep_threshold(rate: float) -> np.uint32:
    """Edges with ``hash >= threshold`` are kept (drop prob = rate)."""
    return np.uint32(min(int(rate * 4294967296.0), 4294967295))


def keep_scale(seed, dst, src, head, rate: float, dtype=jnp.float32):
    """``keep / (1 - rate)`` factor per (edge, head) — multiply into the
    NUMERATOR attention weights only (reference semantics: dropout applies
    after softmax normalisation, denominator unmasked)."""
    keep = edge_hash(seed, dst, src, head) >= keep_threshold(rate)
    return keep.astype(dtype) * (1.0 / (1.0 - rate))
