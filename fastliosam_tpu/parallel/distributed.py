"""Multi-host initialization and mesh construction.

The MulRan-Riverside N≥2-host configuration (BASELINE.md config #5):
keyframes/factors shard along the ``kf`` axis across hosts (collectives
ride DCN between hosts, ICI within a slice). This module is the
`jax.distributed` glue; the solver itself (`sharded_pgo.solve_sharded`)
is topology-agnostic — it only sees the mesh.

Single-host development uses the virtual device fallback
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``).
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialize the multi-host runtime. No-ops on a single process.

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``) so launchers can stay declarative.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0"))
    )
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_count(), jax.process_index()


def global_mesh(axis: str = "kf") -> Mesh:
    """1-D mesh over every device of every host, ordered host-major so the
    keyframe axis splits contiguously across hosts (sequential trajectory
    chunks per host → between-factor gathers stay mostly host-local and
    only the PCG `psum` crosses DCN)."""
    return Mesh(np.asarray(jax.devices()), (axis,))
