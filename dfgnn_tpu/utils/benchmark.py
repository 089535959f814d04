"""Timing + correctness harness.

Parity with the reference's measurement protocol
(``DFGNN/utils/util.py:368-400``): 3 warmup + 10 timed iterations, mean ms —
but with TPU-correct synchronisation (``block_until_ready`` instead of CUDA
events), plus a *chained* variant that runs the iterations inside one
compiled program so sub-millisecond kernels aren't swamped by dispatch
latency (the analog of the reference's cache-flushed ``benchmark_flush``
discipline, ``gtconv_layer_hyper_ablation.py:8-27``).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


class Timer:
    """Wall-clock timer that synchronises the device (ref: CUDA-event Timer,
    ``utils/util.py:368-388``)."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        jax.effects_barrier()
        self.elapsed_ms = (time.perf_counter() - self.t0) * 1e3


def _sync(out):
    """True device barrier: fetch one element of the result.  On the
    remote-attached TPU path ``block_until_ready`` can return before the
    execution ran; a device->host value read always waits."""
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


def benchmark(fn: Callable, *args, warmup: int = 3, iters: int = 10):
    """Mean ms over ``iters`` runs after ``warmup`` runs (ref protocol,
    ``utils/util.py:391-400``).  Returns (last_result, mean_ms)."""
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return out, (time.perf_counter() - t0) / iters * 1e3


def _chained_programs(fn: Callable, first, iters: int, n_lo: int = 2):
    """Build the (lo, hi) jitted chained-loop pair for differential timing."""

    def make(n):
        def run(seed, first, *rest):
            def body(c, _):
                out = fn(first + c, *rest)
                # consume via max: unlike sum, a max-reduction cannot be
                # algebraically distributed through matmuls/copies, so the
                # loop body cannot be simplified away or hoisted.
                return (jnp.max(out) * 1e-30).astype(first.dtype), None

            c, _ = jax.lax.scan(body, seed.astype(first.dtype), None, length=n)
            return c

        return jax.jit(run)

    return make(n_lo), make(n_lo + iters)


def _fresh_seed():
    # seeds must be globally unique: the remote execution path caches
    # results keyed on (program, input values) ACROSS processes.  They must
    # also be LARGE enough that ``first + seed`` differs bitwise from
    # ``first`` (a ~1e-12 seed added to O(1) data rounds away, making every
    # timed execution value-identical and therefore dedupe-able).
    import random as _random

    return jnp.full((), 0.05 + _random.random() * 0.1)


def benchmark_chained(fn: Callable, *args, iters: int = 20) -> float:
    """Mean ms per iteration with the loop *inside* one jitted program.

    Each iteration is data-dependent on the previous (scalar carry folded
    into the first argument) so XLA cannot elide or overlap iterations; the
    full output is consumed via a sum so dead-code elimination cannot slice
    the computation.  Use this for microsecond-scale kernels measured over
    a high-latency dispatch path.
    """

    first = args[0]
    # Two measurement constraints of the remote-attached TPU path:
    #  1. repeated executions with identical argument values are
    #     deduplicated -> every timed call gets a fresh seed;
    #  2. each (non-deduped) execution re-ships its input buffers through
    #     the tunnel, with ~10ms latency VARIANCE per execution -> time
    #     DIFFERENTIALLY: run the loop at two iteration counts and divide
    #     the time difference by the iteration difference, cancelling the
    #     per-execution transfer cost.  The iteration delta must make the
    #     compute difference dominate the tunnel jitter, so when the delta
    #     is not clearly resolved we double ``iters`` and retry.
    rest = args[1:]

    def timed(j, seed):
        # Synchronise by FETCHING the scalar result: on the remote-attached
        # TPU path ``block_until_ready`` can return before the execution
        # actually ran; only a device->host value read is a true barrier.
        t0 = time.perf_counter()
        np.asarray(j(seed, first, *rest))
        return time.perf_counter() - t0

    def best(j, repeats=3):
        ts = [timed(j, _fresh_seed()) for _ in range(repeats)]
        return min(ts), max(ts) - min(ts)

    resolved = False
    for _attempt in range(6):
        used_iters = iters
        lo, hi = _chained_programs(fn, first, used_iters)
        timed(lo, _fresh_seed())  # warm compile
        timed(hi, _fresh_seed())
        t_lo, spread_lo = best(lo)
        t_hi, spread_hi = best(hi)
        diff = t_hi - t_lo
        jitter = max(spread_lo, spread_hi, 1e-4)
        if diff > 2.0 * jitter:
            resolved = True
            break
        iters *= 2
    if not resolved:
        import sys

        print(
            f"[benchmark_chained] WARNING: iteration delta never resolved "
            f"above jitter (diff={diff*1e3:.3f}ms, jitter={jitter*1e3:.3f}ms, "
            f"iters={used_iters}); result is an upper-noise-bound, not a "
            f"measurement",
            file=sys.stderr,
        )
    return max(diff, 1e-9) / used_iters * 1e3


def benchmark_chained_stats(fn: Callable, *args, iters: int = 100,
                            reps: int = 5):
    """Median and spread over ``reps`` independent differential
    measurements (the stability protocol for headline comparisons: tunnel
    latency jitter must not be allowed to pick a winner between two
    implementations ~10% apart).

    The compiled (lo, hi) chained-program pair is reused across reps, so
    the extra repetitions cost execution time only, not compile time.
    Returns ``(median_ms, spread_ms)`` where spread = max - min over the
    per-rep differential estimates.
    """
    first = args[0]
    rest = args[1:]
    lo, hi = _chained_programs(fn, first, iters)

    def timed(j, seed):
        t0 = time.perf_counter()
        np.asarray(j(seed, first, *rest))
        return time.perf_counter() - t0

    timed(lo, _fresh_seed())  # warm compile
    timed(hi, _fresh_seed())
    samples = []
    for _ in range(reps):
        # min-of-3 per rep: each rep is itself robust to one-off tunnel
        # stalls, then the median across reps bounds the remaining drift
        t_lo = min(timed(lo, _fresh_seed()) for _ in range(3))
        t_hi = min(timed(hi, _fresh_seed()) for _ in range(3))
        samples.append(max(t_hi - t_lo, 1e-9) / iters * 1e3)
    samples.sort()
    med = samples[len(samples) // 2] if reps % 2 else 0.5 * (
        samples[reps // 2 - 1] + samples[reps // 2])
    return med, samples[-1] - samples[0]


def benchmark_chained_cold(fn: Callable, *args, iters: int = 20,
                           flush_mb: int = 256) -> float:
    """Cold-state ms per iteration: an HBM-sweeping reduction runs between
    timed iterations, evicting whatever cache/prefetch state survives
    across kernel launches — the TPU analog of the reference's
    cache-flushed timing (``benchmark_flush``: 100 iters with
    ``torch.cuda._sleep`` + L2 flush between runs,
    ``gtconv_layer_hyper_ablation.py:8-27``).

    Measured differentially: chained (fn + flush) minus chained (flush
    only), so the flush's own cost cancels.  The flush is coupled to the
    carry via ``max(|buf - c|)`` — a reduction XLA cannot algebraically
    split into ``f(buf) + g(c)`` and hoist (``max(buf + c)`` CAN be
    rewritten ``max(buf) + c``; the abs-difference form cannot), and each
    iteration's fn input depends on the previous flush's value, so the
    sweep genuinely serialises between iterations.
    """
    first = args[0]
    rest = args[1:]
    n = flush_mb * (1 << 20) // 4

    def _buf():
        # generated in-program (iota): a closed-over materialised buffer
        # would be embedded into the remote-compile request and blow the
        # relay's size limit (HTTP 413).  XLA hoists the (constant) buffer
        # creation out of the timing loop; only the carry-coupled sweep
        # stays inside it.
        return jax.lax.iota(jnp.float32, n) * (1.0 / n)

    def fused(x, *r):
        out = fn(x, *r)
        c = (jnp.max(out) * 1e-30).astype(jnp.float32)
        flush = jnp.max(jnp.abs(_buf() - (c + 0.5)))
        return flush + c

    def flush_only(x):
        # x is a scalar carry: the flush program reads ONLY the sweep
        # buffer, so the difference isolates fn itself
        flush = jnp.max(jnp.abs(_buf() - (x * 1e-30 + 0.5)))
        return flush

    t_full = benchmark_chained(fused, *args, iters=iters)
    t_flush = benchmark_chained(flush_only, jnp.zeros(()), iters=iters)
    return max(t_full - t_flush, 0.0)


def check_correct(a, b, *, rtol: float = 1e-3, atol: float = 1e-5,
                  max_report: int = 5, tolerate_per_node: int = 1) -> bool:
    """Row-wise closeness check with per-node diagnostics.

    Mirrors ``check_correct`` (``DFGNN/utils/util.py:211-236``): a node
    counts as mismatched only if more than ``tolerate_per_node`` of its
    elements violate ``isclose(rtol)``; offending nodes are printed with
    both rows.  Returns True when all nodes pass.
    """
    a = np.asarray(a)
    b = np.asarray(b)
    flat_a = a.reshape(a.shape[0], -1)
    flat_b = b.reshape(b.shape[0], -1)
    close = np.isclose(flat_a, flat_b, rtol=rtol, atol=atol)
    bad_counts = (~close).sum(axis=1)
    bad_nodes = np.nonzero(bad_counts > tolerate_per_node)[0]
    for i in bad_nodes[:max_report]:
        print(f"check_correct: node {i} mismatch ({bad_counts[i]} elems)")
        print("  a:", flat_a[i][:8])
        print("  b:", flat_b[i][:8])
    if bad_nodes.size:
        print(f"check_correct: {bad_nodes.size}/{a.shape[0]} nodes mismatched")
        return False
    return True
