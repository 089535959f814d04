"""Unit tests for the multi-host glue (dfgnn_tpu/parallel/multihost.py).

Real multi-host cannot run in CI (single process); these tests pin the
decision logic — when `initialize` must (not) call
``jax.distributed.initialize`` — and the per-host batch slicing, via
monkeypatched environment and process metadata.
"""

import os
from unittest import mock

import jax
import pytest

from dfgnn_tpu.parallel import multihost


def test_initialize_noop_single_host(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                "TPU_WORKER_COUNT"):
        monkeypatch.delenv(var, raising=False)
    with mock.patch.object(jax.distributed, "initialize") as init:
        assert multihost.initialize() is False
        init.assert_not_called()


@pytest.mark.parametrize("env", [
    {"JAX_COORDINATOR_ADDRESS": "10.0.0.1:8476"},
    {"MEGASCALE_COORDINATOR_ADDRESS": "10.0.0.1:8476"},
    {"TPU_WORKER_COUNT": "4"},
])
def test_initialize_fires_under_launcher(monkeypatch, env):
    for var in ("JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                "TPU_WORKER_COUNT"):
        monkeypatch.delenv(var, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    with mock.patch.object(jax.distributed, "initialize") as init:
        assert multihost.initialize(num_processes=4) is True
        init.assert_called_once_with(num_processes=4)


def test_initialize_blank_worker_count(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("TPU_WORKER_COUNT", "")
    with mock.patch.object(jax.distributed, "initialize") as init:
        assert multihost.initialize() is False
        init.assert_not_called()


def test_process_local_batch_partitions_evenly():
    with mock.patch.object(jax, "process_count", return_value=4), \
         mock.patch.object(jax, "process_index", return_value=2):
        sl = multihost.process_local_batch(64)
        assert sl == slice(32, 48)
    # all hosts together tile the batch exactly
    with mock.patch.object(jax, "process_count", return_value=4):
        covered = []
        for i in range(4):
            with mock.patch.object(jax, "process_index", return_value=i):
                sl = multihost.process_local_batch(64)
                covered.extend(range(sl.start, sl.stop))
        assert covered == list(range(64))
