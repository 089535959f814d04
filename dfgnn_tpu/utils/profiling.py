"""Profiling hooks.

TPU replacement for the reference's three profiling mechanisms (SURVEY.md
section 5.1): nsys/ncu wrappers -> ``jax.profiler`` Perfetto traces;
``ScheduleProfiler`` brackets -> :func:`profile_region`; the ``ind``
start/stop CUDA marker module -> ``jax.profiler.TraceAnnotation`` named
ranges that xprof attributes to kernels.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def profile_region(name: str = "dfgnn", log_dir: str = "/tmp/dfgnn_trace",
                   enabled: bool = True):
    """Capture a jax.profiler trace of the enclosed region (open the result
    with Perfetto / TensorBoard).  The analog of the reference's
    ``--profile`` ScheduleProfiler bracket (``DFGNN/utils/util.py:325-348``)."""
    if not enabled:
        yield None
        return
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        with jax.profiler.TraceAnnotation(name):
            yield log_dir
    print(f"[dfgnn-tpu] trace written to {log_dir}")


def annotate(name: str):
    """Named range (the ``ind.start()/ind.end()`` analog, N22)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def timed_region(name: str):
    t0 = time.perf_counter()
    yield
    jax.effects_barrier()
    print(f"[{name}] {(time.perf_counter()-t0)*1e3:.2f} ms")
