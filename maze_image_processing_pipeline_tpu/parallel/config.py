"""Config-reachable multi-chip execution.

The reference exposes its parallelism as a config knob
(``maze_ipp/loki/config_schema.py:66-68`` — ``n_threads`` thread-replicated
models). The TPU equivalent is a *device mesh*: one model, batches sharded
over the ``data`` axis, XLA inserting ICI collectives. This module provides
the ``parallel:`` YAML section shared by both workloads and the runner-side
setup that turns it into a live :class:`jax.sharding.Mesh`.

YAML surface::

    parallel: true               # all local devices on one 'data' axis
    # or
    parallel:
      mesh: {data: 4, model: 2}  # explicit axis layout
      coordinator_address: host0:1234   # multi-host (jax.distributed)
      num_processes: 2
      process_id: 0
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

from pydantic import Field

from ..config import TrueToDefaultsModel

logger = logging.getLogger(__name__)

__all__ = ["ParallelConfig", "setup_parallel"]


class ParallelConfig(TrueToDefaultsModel):
    mesh: Optional[Dict[str, int]] = Field(
        None,
        description="Named mesh axes (e.g. {data: 8} or {data: 4, model: 2}). "
        "Axis sizes must multiply to the device count. "
        "Default: all devices on one 'data' axis.",
    )
    data_axis: str = Field(
        "data", description="Mesh axis over which inference batches are sharded."
    )
    coordinator_address: Optional[str] = Field(
        None,
        description="host:port of process 0 for multi-host runs "
        "(passed to jax.distributed.initialize). Single-host when unset.",
    )
    num_processes: Optional[int] = Field(
        None, description="Total number of processes in a multi-host run."
    )
    process_id: Optional[int] = Field(
        None, description="This process's index in a multi-host run."
    )


def setup_parallel(config) -> Optional["jax.sharding.Mesh"]:  # noqa: F821
    """Initialize distribution (if configured) and build the device mesh.

    Returns ``None`` when ``parallel`` is disabled — the workloads then run
    single-device exactly as before.
    """
    if not config:
        return None

    from .mesh import make_mesh
    from .multihost import initialize_distributed

    initialize_distributed(
        coordinator_address=config.coordinator_address,
        num_processes=config.num_processes,
        process_id=config.process_id,
    )

    mesh = make_mesh(config.mesh)
    logger.info(
        "Parallel execution over mesh %s (%d devices)",
        dict(zip(mesh.axis_names, mesh.devices.shape)),
        mesh.devices.size,
    )
    return mesh
