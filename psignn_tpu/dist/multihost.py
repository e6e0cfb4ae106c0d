"""Multi-host runtime initialization.

The reference has no distributed backend at all (single-process
DataParallel, SURVEY.md §5.8).  The jax-native replacement for the entire
NCCL/Gloo/MPI role is ``jax.distributed.initialize`` plus compiled
collectives: within a slice they ride ICI, across slices DCN — no separate
communication library.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (idempotent, no-op single-host).

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly for CPU/GPU multi-process testing.
    """
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def global_mesh(axis: str = "dp"):
    """1-D mesh over ALL devices across hosts (DP spans the full slice)."""
    import numpy as np
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis,))


def is_coordinator() -> bool:
    return jax.process_index() == 0
