"""Odometry over the slot-sharded voxel map (VERDICT r3 #5: the last piece
of the MulRan-Riverside N≥2-host configuration, BASELINE.json config #5).

`odom_step` takes a ``map_ops`` backend; :func:`sharded_map_ops` provides
the multi-device implementation — the voxel-surfel tables live sharded
along the hash-slot axis (each device holds capacity/n slots, the memory
story for ~7 km maps), while the scan, nav state, and iEKF solve stay
replicated:

* query  — `sharded_map.query_planes_merged3_sharded` (pmin probe
  resolution + one (N, 10) psum per stencil position);
* insert — `sharded_map.insert_sharded` (owner-local claim tournaments,
  one fingerprint-view psum per probe round);
* evict  — per-shard FoV sliding: distance test + clear are elementwise
  over slots, so eviction is fully local (ZERO collectives).

Equivalence with the replicated step is tested end-to-end on the 8-virtual-
device CPU mesh (`tests/test_parallel.py::test_sharded_odom_step_matches_
replicated`) and exercised by the driver's `dryrun_multichip`.

Reference scaling pain point: FAST-LIO's single-host ikd-Tree map
(SURVEY §3.6) and its cube_side_length/det_range FoV sliding.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

from jax.sharding import NamedSharding

from ..map.voxel_hash import VoxelMap, VoxelMapConfig, evict_far
from .sharded_map import insert_sharded, query_planes_merged3_sharded


def shard_map_arrays(m: VoxelMap, mesh: Mesh, axis: str = "kf") -> VoxelMap:
    """Place an existing map's tables sharded along the slot axis."""
    spec = lambda *s: NamedSharding(mesh, P(*s))  # noqa: E731
    return VoxelMap(
        fp=jax.device_put(m.fp, spec(axis)),
        coords=jax.device_put(m.coords, spec(axis, None)),
        moments=jax.device_put(m.moments, spec(axis, None)),
        normal=jax.device_put(m.normal, spec(axis, None)),
        d=jax.device_put(m.d, spec(axis)),
        plane_valid=jax.device_put(m.plane_valid, spec(axis)),
    )


class MapOps(NamedTuple):
    """Pluggable voxel-map backend for `odom/pipeline.odom_step`."""

    query: object  # (vmap, map_cfg, pts_world, mask) -> (n, d, valid, rvar)
    insert: object  # (vmap, map_cfg, pts_world, mask) -> (vmap, n_dropped)
    evict: object  # (vmap, map_cfg, center, det_range) -> vmap


def evict_far_sharded(m: VoxelMap, cfg: VoxelMapConfig, center_xyz,
                      det_range, mesh: Mesh, axis: str = "kf"):
    """FoV-sliding eviction on the slot-sharded map: every slot's keep/clear
    decision depends only on its own coords, so each device evicts its
    shard locally — no collectives."""
    return _evict_prog(cfg, float(det_range), mesh, axis)(m, center_xyz)


@lru_cache(maxsize=None)
def _evict_prog(cfg, det_range, mesh, axis):
    """Jitted + cached per (cfg, range, mesh, axis) — building the
    shard_map closure per call re-traces and re-compiles every time."""
    spec = VoxelMap(
        fp=P(axis), coords=P(axis, None), moments=P(axis, None),
        normal=P(axis, None), d=P(axis), plane_valid=P(axis),
    )

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=spec,
        check_vma=False,
    )
    def f(m_l, c):
        return evict_far(m_l, cfg, c, det_range)

    return f


def sharded_map_ops(mesh: Mesh, axis: str = "kf") -> MapOps:
    """The slot-sharded map backend (see module docstring)."""
    return MapOps(
        query=lambda m, cfg, pts, msk: query_planes_merged3_sharded(
            m, cfg, pts, msk, mesh, axis
        ),
        insert=lambda m, cfg, pts, msk: insert_sharded(
            m, cfg, pts, msk, mesh, axis
        ),
        evict=lambda m, cfg, c, r: evict_far_sharded(
            m, cfg, c, r, mesh, axis
        ),
    )
