"""Device-mesh and sharding helpers.

The reference's "distributed backend" is ROS TCPROS between two processes
(SURVEY.md §2.3); the TPU-native equivalent is a `jax.sharding.Mesh` with
named axes and XLA collectives over ICI/DCN:

  * ``kf``: the keyframe/factor axis — the long-sequence scaling axis
    (trajectory length). PGO factor blocks shard along it.
  * ``pt``: the point axis inside a scan — residual/Jacobian/Gram work
    shards along it for huge scans (HDL-64 ~130k points).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "kf") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_leading(mesh: Mesh, x, axis: str = "kf"):
    """Place an array sharded along its leading dimension."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
