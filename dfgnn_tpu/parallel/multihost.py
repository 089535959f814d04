"""Multi-host initialisation glue.

The reference has no distributed backend (SURVEY.md section 2.3); on TPU
pods, multi-host SPMD needs only `jax.distributed.initialize` before any
backend use — GSPMD/`shard_map` then treat all chips in the slice as one
mesh, with ICI intra-slice and DCN across slices.

Typical pod-slice launch (same program on every host):

    from dfgnn_tpu.parallel.multihost import initialize
    initialize()                       # no-op on single host
    mesh = make_mesh()                 # global device mesh
    pg = partition_graph(g, len(jax.devices()), mesh=mesh)
    # ... identical to single-host code; inputs use
    # jax.make_array_from_process_local_data for host-sharded loading.
"""

from __future__ import annotations

import os


def initialize(**kwargs) -> bool:
    """Initialise jax.distributed when running under a multi-host launcher
    (detected via standard TPU env vars); returns True if initialised."""
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ) or int(os.environ.get("TPU_WORKER_COUNT", "1") or "1") > 1:
        jax.distributed.initialize(**kwargs)
        return True
    return False


def process_local_batch(global_batch_size: int) -> slice:
    """The slice of a global batch this host should load."""
    import jax

    per = global_batch_size // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
