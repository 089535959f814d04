"""Checkpoint / resume (orbax).

The reference has no model checkpointing (SURVEY.md section 5.4); this adds
the standard TPU-native mechanism for training-at-scale: orbax save/restore
of (params, opt_state, step).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any, step: int) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = os.path.join(path, f"step_{step}")
    ckptr.save(target, state, force=True)
    ckptr.wait_until_finished()
    return target


def restore_checkpoint(path: str, template: Any, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is None:
        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(path) if d.startswith("step_")
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        step = steps[-1]
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(path, f"step_{step}"), template), step
