"""Multi-host initialization over DCN (SURVEY.md §5 distributed-backend row).

The reference is single-process/single-GPU; scaling here goes through
``jax.distributed`` for multi-host pods: each host calls
:func:`initialize` before any jax computation, then builds the global
('data','y','x') mesh over *all* devices with ``parallel.mesh.make_mesh`` —
`shard_map` + ppermute halos then ride ICI within a slice and DCN across.

This module can't be exercised on the single-chip dev environment; it is the
documented, tested-by-inspection entry point for pod runs (the virtual-mesh
tests in tests/test_sharded.py validate the collective layout itself).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or the standard env vars.

    On TPU pods (GKE/QR), ``jax.distributed.initialize()`` autodetects;
    explicit args cover manual bring-up:
      COORDINATOR_ADDRESS host:port, NUM_PROCESSES, PROCESS_ID.
    Safe to call once per process, before any computation.
    """
    if jax.process_count() > 1:
        return  # already initialized
    kw = {}
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        kw["coordinator_address"] = addr
    n = num_processes or os.environ.get("NUM_PROCESSES")
    if n:
        kw["num_processes"] = int(n)
    pid = process_id if process_id is not None else os.environ.get("PROCESS_ID")
    if pid is not None:
        kw["process_id"] = int(pid)
    try:
        jax.distributed.initialize(**kw)
    except Exception as e:  # single-process dev environments
        if kw:
            raise
        # no coordinator configured: stay single-process
        _ = e


def runtime_info() -> dict:
    """Process/device topology summary for logs and failure triage."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "platform": jax.devices()[0].platform,
    }
