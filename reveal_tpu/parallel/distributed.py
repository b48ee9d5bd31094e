"""Multi-host initialization for the distributed alignment pipeline.

The reference has no distributed backend (SURVEY.md §2.3 P6 — its
"cluster" story is independent shell jobs on shared files,
reveal/align.py:27-54).  The TPU-native equivalent: every host calls
``init_distributed`` (jax.distributed.initialize) before first backend
use, builds one global mesh over all devices (ICI within a slice, DCN
across hosts), and runs the SAME SPMD program — the frontier driver is
deterministic, so every host computes identical picks and the sharded
kernels communicate via XLA collectives.

``global_mesh`` returns a mesh over every device in the job;
``make_frontier_mesh`` keeps the slot axis on the fastest network
dimension.  The 2-host CPU emulation lives in
tests/test_distributed.py (two subprocesses, one CPU device each).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger(__name__)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from arguments or the standard env
    variables (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID).  No-op for single-process jobs (nothing set)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "jax.distributed up: process %d/%d via %s",
        process_id,
        num_processes,
        coordinator_address,
    )


def global_mesh(axis: str = "shard"):
    """1-D mesh over every device in the (possibly multi-host) job."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))
