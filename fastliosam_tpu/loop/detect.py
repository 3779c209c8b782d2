"""Loop-candidate search: vectorized radius + time-gap gating.

Replaces the reference's O(N) host loop over keyframes
(`LoopClosure::fetchClosestKeyframeIdx`, `loop_closure.cpp:18-40`): keep
keyframes within ``radius`` whose timestamp differs by more than
``time_gap`` seconds from the query, return the nearest. One masked argmin
over the keyframe SoA — trivially shardable along the keyframe axis.
"""
from __future__ import annotations

import jax.numpy as jnp


def fetch_closest_keyframe_idx(
    positions,  # (K, 3) keyframe translations (corrected)
    stamps,  # (K,) keyframe timestamps (s)
    kf_valid,  # (K,) bool
    query_idx,  # scalar int
    radius: float,  # loop_detection_radius (config.yaml:11 -> 35 m)
    time_gap: float,  # loop_detection_timediff_threshold (config.yaml:12 -> 30 s)
):
    """Returns ``(idx, found)``; idx == -1 when no candidate qualifies."""
    qpos = positions[query_idx]
    qstamp = stamps[query_idx]
    d = jnp.linalg.norm(positions - qpos, axis=-1)
    ok = (
        kf_valid
        & (d < radius)
        & (jnp.abs(qstamp - stamps) > time_gap)
    )
    d_masked = jnp.where(ok, d, jnp.inf)
    idx = jnp.argmin(d_masked)
    found = jnp.isfinite(d_masked[idx])
    return jnp.where(found, idx.astype(jnp.int32), -1), found
