"""Map-based localization against a previously built keyframe map.

The reference exports its keyframe bag explicitly "for
FAST-LIO-Localization-QN" (`config.yaml:21`) — a separate package that
relocalizes new sensor streams against a saved map. This module provides
that capability natively: load a keyframe bundle (from
`persistence.save_results`), rasterize it into a frozen voxel-surfel map,
and run the same iterated-ESKF odometry against it with map insertion
disabled. Global initial alignment uses ICP of the first scan against the
map (given a rough initial pose).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import se3
from ..loop.icp import icp_align
from ..map import VoxelMapConfig, insert, make_map, occupied_centroids
from ..odom import ImuBatch, OdomConfig, Scan
from ..odom.imu import deskew, propagate
from ..odom.iekf import iekf_update
from ..odom.state import NavState, init_state
from ..core.pointcloud import Cloud, voxel_downsample


def build_map_from_keyframes(
    bundle_path: str, map_cfg: VoxelMapConfig, batch: int = 65536
):
    """Load a keyframe .npz bundle and accumulate all world-frame points
    into a voxel-surfel map."""
    blob = np.load(bundle_path)
    poses = blob["poses"]  # (K, 4, 4)
    clouds = blob["clouds"]  # (K, P, 3) body frame
    masks = blob["masks"]
    world = np.einsum("kij,kpj->kpi", poses[:, :3, :3], clouds) + poses[
        :, None, :3, 3
    ]
    flat = world.reshape(-1, 3).astype(np.float32)
    fmask = masks.reshape(-1)
    m = make_map(map_cfg)
    ins = jax.jit(
        lambda m, p, msk: insert(m, map_cfg, p, msk), donate_argnums=(0,)
    )
    for s in range(0, len(flat), batch):
        chunk = flat[s : s + batch]
        cmask = fmask[s : s + batch]
        if len(chunk) < batch:
            pad = batch - len(chunk)
            chunk = np.pad(chunk, ((0, pad), (0, 0)), constant_values=1e6)
            cmask = np.pad(cmask, (0, pad))
        m, _ = ins(m, jnp.asarray(chunk), jnp.asarray(cmask))
    return m


class MapLocalizer:
    """Relocalize a LiDAR-inertial stream against a frozen map."""

    def __init__(
        self,
        bundle_path: str,
        map_cfg: VoxelMapConfig = VoxelMapConfig(),
        odom_cfg: OdomConfig = OdomConfig(),
    ):
        self.map_cfg = map_cfg
        self.odom_cfg = odom_cfg
        self.vmap = build_map_from_keyframes(bundle_path, map_cfg)
        self.nav: NavState = init_state(cfg=odom_cfg)
        self.initialized = False

        from ..utils.precision import geometry_precision

        @geometry_precision
        def _step(nav, vmap, scan, imu, dt):
            d2 = jnp.sum(scan.xyz * scan.xyz, axis=-1)
            mask = scan.mask & (d2 > odom_cfg.blind**2) & (
                d2 < odom_cfg.det_range**2
            )
            nav_prop, traj = propagate(nav, imu, odom_cfg, dt)
            pts_body = deskew(
                scan.xyz, scan.t_offset, mask, traj, nav_prop, odom_cfg,
                imu.mask, dt,
            )
            ds = voxel_downsample(
                Cloud(xyz=pts_body, mask=mask), odom_cfg.filter_size_surf
            )
            budget = min(odom_cfg.num_ds_points, ds.xyz.shape[0])
            nav_new, n_matched = iekf_update(
                nav_prop, ds.xyz[:budget], ds.mask[:budget], vmap, map_cfg,
                odom_cfg,
            )
            return nav_new, n_matched

        self._jit_step = jax.jit(_step, donate_argnums=(0,))

    def global_init(self, scan: Scan, guess_T=None, max_iterations: int = 40):
        """Align the first scan to the map by ICP from a rough pose guess
        (the relocalization bootstrap). Returns fitness."""
        if guess_T is None:
            guess_T = jnp.eye(4, dtype=jnp.float32)
        map_pts, occ = occupied_centroids(self.vmap, self.map_cfg)
        ds = voxel_downsample(
            Cloud(xyz=scan.xyz, mask=scan.mask), self.odom_cfg.filter_size_surf
        )
        budget = min(8192, ds.xyz.shape[0])
        T, fitness, n_corr = icp_align(
            ds.xyz[:budget],
            ds.mask[:budget],
            map_pts,
            occ,
            init_T=guess_T,
            max_iterations=max_iterations,
            max_corr_dist=5.0,
            trim_fraction=0.8,
        )
        R, t = se3.rot(T), se3.trans(T)
        self.nav = self.nav._replace(R=R, p=t)
        self.initialized = True
        return float(fitness)

    def process(self, scan: Scan, imu: ImuBatch, scan_dt: float):
        """One localization step. Returns (pose (4,4) numpy, n_matched)."""
        if not self.initialized:
            raise RuntimeError("call global_init() with the first scan first")
        self.nav, n_matched = self._jit_step(
            self.nav, self.vmap, scan, imu, jnp.float32(scan_dt)
        )
        return (
            np.asarray(se3.make(self.nav.R, self.nav.p)),
            int(n_matched),
        )
