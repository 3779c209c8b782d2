"""Georeferencing: apply fitted alignments to trajectories and PCD maps.

Capability ports of `geo_ref_slam_wgs84.py:360-427` (trajectory -> WGS84)
and `georeference_pcd.py` (apply saved similarity params to a full PCD,
preserving all fields).
"""
from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

from ..core.geodesy import LocalCartesian
from .align import Similarity2D, fit_similarity_2d, match_by_timestamp
from ..io.pcd import read_pcd, write_pcd, xyz_of, with_xyz


def save_alignment_params(path: str, sim: Similarity2D, extra: dict | None = None):
    d = sim.to_dict()
    if extra:
        d.update(extra)
    with open(path, "w") as f:
        json.dump(d, f, indent=2)


def load_alignment_params(path: str) -> Similarity2D:
    with open(path) as f:
        d = json.load(f)
    keys = {"scale", "theta", "tx", "ty", "tz"}
    return Similarity2D(**{k: v for k, v in d.items() if k in keys})


def georeference_trajectory(
    slam_stamps,
    slam_positions,  # (N, 3) SLAM frame
    gps_stamps,
    gps_lat,
    gps_lon,
    gps_alt=None,
    tol: float = 0.5,
):
    """Fit the SLAM->ENU similarity from timestamp-matched pairs, then emit
    WGS84 lat/lon for every SLAM position.

    Returns ``(lat, lon, Similarity2D, report)``; the primary
    georeferencing pipeline (`geo_ref_slam_wgs84.py` main_pipeline).
    """
    gps_alt = np.zeros_like(gps_lat) if gps_alt is None else np.asarray(gps_alt)
    anchor = LocalCartesian.from_origin(gps_lat[0], gps_lon[0], gps_alt[0])
    enu = np.asarray(
        anchor.forward(jnp.asarray(gps_lat), jnp.asarray(gps_lon), jnp.asarray(gps_alt))
    )
    ia, ib = match_by_timestamp(np.asarray(slam_stamps), np.asarray(gps_stamps), tol)
    if len(ia) < 3:
        raise ValueError(f"only {len(ia)} timestamp matches (need >= 3)")
    sim = fit_similarity_2d(np.asarray(slam_positions)[ia, :2], enu[ib, :2])
    res = np.linalg.norm(
        sim.apply(np.asarray(slam_positions)[ia, :2]) - enu[ib, :2], axis=1
    )
    report = {
        "mean_error_m": float(res.mean()),
        "std_error_m": float(res.std()),
        "n_pairs": int(len(ia)),
    }
    aligned = sim.apply(np.asarray(slam_positions)[:, :2])
    enu_full = np.column_stack(
        [aligned, np.asarray(slam_positions)[:, 2]]
    )
    lat, lon, _ = anchor.reverse(jnp.asarray(enu_full, jnp.float32))
    return np.asarray(lat), np.asarray(lon), sim, report


def georeference_pcd(in_path: str, out_path: str, sim: Similarity2D):
    """Apply a fitted 2D similarity to a whole PCD map, preserving all
    fields (`georeference_pcd.py` capability)."""
    cloud = read_pcd(in_path)
    xyz = xyz_of(cloud)
    write_pcd(out_path, with_xyz(cloud, sim.apply_xyz(xyz)))
