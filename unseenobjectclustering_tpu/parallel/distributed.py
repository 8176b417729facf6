"""Multi-host (multi-slice) initialization helpers.

Single-slice data parallelism needs nothing beyond parallel.mesh (XLA
collectives ride ICI).  To scale training across hosts/slices, call
`initialize()` once per process before any jax op; `jax.devices()` then
spans all hosts and the same mesh/sharding code works unchanged, with
cross-host reductions compiled onto DCN (SURVEY.md §2.6).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op on single
    process when nothing is configured."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return  # single-process run
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None or "NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(
            num_processes if num_processes is not None
            else os.environ["NUM_PROCESSES"])
    if process_id is not None or "PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally-indexed batch this process should load
    (per-host data loading for multi-host DP)."""
    import jax

    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
