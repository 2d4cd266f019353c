"""Multi-host bootstrap — the replacement for DDP process management.

The reference launches one process per GPU via Lightning/NCCL
(``num_nodes``, main.py:70,86-104).  On TPU pods there is exactly one call:
``jax.distributed.initialize()`` — after it, ``jax.devices()`` spans all
hosts, the same SPMD programs run globally, and collectives ride ICI within
a slice and DCN across slices.  This module wraps it with environment
detection so single-host runs need no flags.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialise multi-host JAX when running in a multi-process environment.

    Returns True if distributed mode was initialised.  No-ops (False) for
    single-process runs — the common local/dev case.  On Cloud TPU pods the
    arguments are auto-detected from the TPU metadata environment.
    """
    explicit = coordinator_address is not None
    # TPU_WORKER_HOSTNAMES with a SINGLE host is not a pod: dev tunnels
    # (axon) export it as "localhost", and auto-initialising there aborts
    # every CLI run with "coordinator_address should be defined"
    workers = [h for h in
               os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    auto = (len(workers) > 1 or any(v in os.environ for v in (
        "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")))
    if not explicit and not auto:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        # backends already initialised (single-process dev/tunnel session),
        # double-call, or auto-detection without a resolvable coordinator —
        # treat as single-process
        del e
        if explicit:
            raise
        return False
    return True


def process_info() -> tuple[int, int]:
    """(process_index, process_count)."""
    return jax.process_index(), jax.process_count()
