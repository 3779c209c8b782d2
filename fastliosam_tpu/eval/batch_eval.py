"""Batched (data-parallel) odometry evaluation.

The DP axis of SURVEY.md §2.3: evaluate many sequences at once by vmapping
the whole odometry rollout — each lane carries its own filter state and
voxel map, XLA batches every gather/scatter/matmul across lanes. Useful
for parameter sweeps and regression fleets on one chip, and shards
trivially over a mesh axis for multi-chip eval farms.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..map.voxel_hash import VoxelMapConfig
from ..odom.pipeline import OdomState, Scan, odom_rollout
from ..odom.imu import ImuBatch
from ..odom.state import OdomConfig


def batched_rollout(
    states: OdomState,  # batched pytree: leaves have leading dim B
    scans: Scan,  # (B, S, N, ...) stacked
    imus: ImuBatch,  # (B, S, M, ...)
    scan_dt,
    cfg: OdomConfig,
    map_cfg: VoxelMapConfig,
):
    """Run B sequences of S scans each in one vmapped dispatch.

    Returns ``(states, aux)`` with every output carrying a leading batch
    dim. Memory scales with B voxel maps — size ``map_cfg.capacity``
    accordingly.
    """
    fn = jax.vmap(
        lambda st, sc, im: odom_rollout(st, sc, im, scan_dt, cfg, map_cfg)
    )
    return fn(states, scans, imus)


def stack_states(states: list) -> OdomState:
    """Stack a list of per-sequence OdomStates into one batched pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)
