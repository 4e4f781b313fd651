"""Multi-host scaling helpers.

The LOKI/predict workloads are embarrassingly parallel at the
sample/archive level (one output archive per sample —
``loki/pipeline.py:844-850``), so multi-host scaling partitions the input
list per host and runs the ordinary single-host pipeline on each slice;
``output.skip_existing`` makes retries idempotent. DCN traffic is zero —
collectives are only used inside a host's chip mesh (training).
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Sequence, TypeVar

logger = logging.getLogger(__name__)

T = TypeVar("T")

__all__ = ["initialize_distributed", "partition_work", "host_id", "host_count"]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or standard env vars.

    No-op when single-process (no coordinator configured).
    """
    coordinator_address = coordinator_address or os.environ.get("MAZE_IPP_COORDINATOR")
    if coordinator_address is None:
        return
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed initialized: process %d of %d",
        jax.process_index(),
        jax.process_count(),
    )


def host_id() -> int:
    import jax

    return jax.process_index()


def host_count() -> int:
    import jax

    return jax.process_count()


def partition_work(
    items: Sequence[T],
    n_hosts: Optional[int] = None,
    this_host: Optional[int] = None,
) -> List[T]:
    """Deterministic strided partition of a work list across hosts.

    Striding (rather than contiguous chunks) balances load when sample
    sizes correlate with their position in the sorted list.
    """
    if n_hosts is None:
        n_hosts = host_count()
    if this_host is None:
        this_host = host_id()
    if not 0 <= this_host < n_hosts:
        raise ValueError(f"host {this_host} not in [0, {n_hosts})")
    subset = list(items[this_host::n_hosts])
    logger.info(
        "Host %d/%d takes %d of %d work items", this_host, n_hosts, len(subset), len(items)
    )
    return subset
