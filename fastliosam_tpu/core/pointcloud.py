"""Fixed-capacity padded point clouds and scatter/sort voxel downsampling.

XLA wants static shapes, so every cloud is a ``(capacity, 3)`` float array
plus a boolean ``(capacity,)`` validity mask. Invalid lanes hold a far-away
sentinel so distance math never accidentally matches padding.

Voxel downsampling is the TPU-native equivalent of the reference's
``voxelizePcd`` (PCL ``VoxelGrid``, `utilities.hpp:158-183`): points are
bucketed into voxels, one centroid per occupied voxel. Implemented with a
sort over packed 30-bit voxel keys + segmented mean — no trees, no host
round-trips, deterministic.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Sentinel position for padded lanes (far from any plausible map content).
PAD_VALUE = 1.0e6


class Cloud(NamedTuple):
    """Padded point cloud. ``xyz (N, 3)`` float32, ``mask (N,)`` bool."""

    xyz: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32))


def make_cloud(xyz, mask=None, capacity: int | None = None) -> Cloud:
    """Build a padded Cloud from (n, 3) points (pads / truncates to capacity)."""
    xyz = jnp.asarray(xyz, dtype=jnp.float32)
    n = xyz.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    if capacity is None:
        capacity = n
    if n >= capacity:
        xyz = xyz[:capacity]
        mask = mask[:capacity]
    else:
        pad = capacity - n
        xyz = jnp.concatenate(
            [xyz, jnp.full((pad, 3), PAD_VALUE, dtype=jnp.float32)], axis=0
        )
        mask = jnp.concatenate([mask, jnp.zeros((pad,), dtype=bool)], axis=0)
    xyz = jnp.where(mask[:, None], xyz, PAD_VALUE)
    return Cloud(xyz=xyz, mask=mask)


def _pack_voxel_keys(xyz, mask, voxel_size):
    """Pack per-point voxel coords into a sortable int32 key.

    Coordinates are taken relative to the (masked) min corner so 10 bits per
    axis suffice for any single scan (1024 voxels/axis); out-of-range points
    are clamped (they only risk merging with other clamped far-away points).
    Invalid points get the maximum key so they sort to the end.
    """
    big = jnp.where(mask[:, None], xyz, jnp.inf)
    lo = jnp.min(big, axis=0)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    ij = jnp.floor((xyz - lo) / voxel_size).astype(jnp.int32)
    ij = jnp.clip(ij, 0, 1022)
    key = (ij[:, 0] << 20) | (ij[:, 1] << 10) | ij[:, 2]
    return jnp.where(mask, key, jnp.int32(0x3FFFFFFF))


def voxel_downsample(cloud: Cloud, voxel_size: float) -> Cloud:
    """VoxelGrid-style centroid downsample. Output keeps the input capacity
    with occupied-voxel centroids **packed to the front** (single sort; the
    packing reuses the key sort via a unique-index scatter, so no separate
    `compact` pass is needed).

    NOTE (r3): argsort + post-gathers is deliberate. The multi-operand
    payload variant (`lax.sort((keys, x, y, z, mask), num_keys=1)`) wedges
    the remote TPU compile service for 30+ minutes — do not reintroduce it
    without compile-testing standalone first."""
    xyz, mask = cloud.xyz, cloud.mask
    n = xyz.shape[0]
    keys = _pack_voxel_keys(xyz, mask, voxel_size)
    order = jnp.argsort(keys)
    skeys = keys[order]
    sxyz = xyz[order]
    smask = mask[order]
    # Segment ids: 0-based index of each distinct key run. Invalid lanes all
    # share the sentinel key and sort to the tail as one segment.
    is_start = jnp.concatenate(
        [jnp.ones((1,), dtype=jnp.int32), (skeys[1:] != skeys[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(is_start) - 1
    w = smask.astype(jnp.float32)
    sums = jax.ops.segment_sum(sxyz * w[:, None], seg, num_segments=n)
    cnts = jax.ops.segment_sum(w, seg, num_segments=n)
    centroids = sums / jnp.maximum(cnts, 1.0)[:, None]
    occupied = cnts > 0.0
    # pack occupied segments to the front: destination = rank among occupied
    dest = jnp.where(occupied, jnp.cumsum(occupied.astype(jnp.int32)) - 1, n)
    out_xyz = jnp.full((n, 3), PAD_VALUE, jnp.float32).at[dest].set(
        centroids.astype(jnp.float32), mode="drop", unique_indices=True
    )
    out_mask = jnp.zeros((n,), bool).at[dest].set(
        occupied, mode="drop", unique_indices=True
    )
    return Cloud(xyz=out_xyz, mask=out_mask)


def voxel_downsample_points(xyz, mask, voxel_size: float):
    """Array-level variant returning ``(xyz, mask)``."""
    c = voxel_downsample(Cloud(xyz=xyz, mask=mask), voxel_size)
    return c.xyz, c.mask


def stride_filter(cloud: Cloud, point_filter_num: int) -> Cloud:
    """Keep every k-th point (FAST-LIO ``point_filter_num`` preprocessing,
    SURVEY.md §3.6)."""
    if point_filter_num <= 1:
        return cloud
    idx = jnp.arange(cloud.capacity)
    keep = (idx % point_filter_num) == 0
    mask = cloud.mask & keep
    return Cloud(xyz=jnp.where(mask[:, None], cloud.xyz, PAD_VALUE), mask=mask)


def blind_filter(cloud: Cloud, blind: float) -> Cloud:
    """Drop points closer than ``blind`` meters to the sensor (FAST-LIO
    ``preprocess.blind``)."""
    d2 = jnp.sum(cloud.xyz * cloud.xyz, axis=-1)
    mask = cloud.mask & (d2 > blind * blind)
    return Cloud(xyz=jnp.where(mask[:, None], cloud.xyz, PAD_VALUE), mask=mask)


def range_filter(cloud: Cloud, max_range: float) -> Cloud:
    """Drop points beyond ``max_range`` (det_range semantics)."""
    d2 = jnp.sum(cloud.xyz * cloud.xyz, axis=-1)
    mask = cloud.mask & (d2 < max_range * max_range)
    return Cloud(xyz=jnp.where(mask[:, None], cloud.xyz, PAD_VALUE), mask=mask)


def compact(cloud: Cloud) -> Cloud:
    """Pack valid points to the front (stable). Capacity unchanged."""
    order = jnp.argsort(~cloud.mask, stable=True)
    xyz = cloud.xyz[order]
    mask = cloud.mask[order]
    return Cloud(xyz=jnp.where(mask[:, None], xyz, PAD_VALUE), mask=mask)


def concat(a: Cloud, b: Cloud) -> Cloud:
    return Cloud(
        xyz=jnp.concatenate([a.xyz, b.xyz], axis=0),
        mask=jnp.concatenate([a.mask, b.mask], axis=0),
    )
