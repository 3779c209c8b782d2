"""Geodetic math: WGS84 <-> ECEF <-> local ENU, and Transverse Mercator.

TPU-native replacement for the reference's GeographicLib ``LocalCartesian``
(used for GPS factors at `fast_lio_sam.cpp:156-161`) and for the pyproj
EPSG:4326 -> EPSG:2326 (HK1980 grid) conversion used by the post-processing
scripts (`post_process/align_slam_gps_icp.py:71-78`). Pure array math,
batched, works under jit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# WGS84 ellipsoid
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)  # first eccentricity squared


def geodetic_to_ecef(lat_deg, lon_deg, alt):
    """WGS84 geodetic (degrees, meters) -> ECEF xyz (meters)."""
    lat = jnp.deg2rad(lat_deg)
    lon = jnp.deg2rad(lon_deg)
    sin_lat, cos_lat = jnp.sin(lat), jnp.cos(lat)
    sin_lon, cos_lon = jnp.sin(lon), jnp.cos(lon)
    n = WGS84_A / jnp.sqrt(1.0 - WGS84_E2 * sin_lat * sin_lat)
    x = (n + alt) * cos_lat * cos_lon
    y = (n + alt) * cos_lat * sin_lon
    z = (n * (1.0 - WGS84_E2) + alt) * sin_lat
    return jnp.stack([x, y, z], axis=-1)


def ecef_to_geodetic(xyz):
    """ECEF -> WGS84 geodetic via Bowring's method (one iteration refinement).

    Accurate to well under a millimeter for terrestrial altitudes.
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    lon = jnp.arctan2(y, x)
    p = jnp.sqrt(x * x + y * y)
    # Bowring initial parametric latitude
    theta = jnp.arctan2(z * WGS84_A, p * WGS84_B)
    ep2 = (WGS84_A * WGS84_A - WGS84_B * WGS84_B) / (WGS84_B * WGS84_B)
    lat = jnp.arctan2(
        z + ep2 * WGS84_B * jnp.sin(theta) ** 3,
        p - WGS84_E2 * WGS84_A * jnp.cos(theta) ** 3,
    )
    for _ in range(2):  # fixed-point refinement
        sin_lat = jnp.sin(lat)
        n = WGS84_A / jnp.sqrt(1.0 - WGS84_E2 * sin_lat * sin_lat)
        h = p / jnp.cos(lat) - n
        lat = jnp.arctan2(z, p * (1.0 - WGS84_E2 * n / (n + h)))
    sin_lat = jnp.sin(lat)
    n = WGS84_A / jnp.sqrt(1.0 - WGS84_E2 * sin_lat * sin_lat)
    h = p / jnp.cos(lat) - n
    return jnp.rad2deg(lat), jnp.rad2deg(lon), h


class LocalCartesian(NamedTuple):
    """An ENU frame anchored at a geodetic origin (GeographicLib equivalent).

    ``origin_ecef (3,)`` and the ECEF->ENU rotation ``rot (3, 3)``.
    """

    origin_ecef: jnp.ndarray
    rot: jnp.ndarray

    @staticmethod
    def from_origin(lat_deg, lon_deg, alt) -> "LocalCartesian":
        origin = geodetic_to_ecef(lat_deg, lon_deg, alt)
        lat = jnp.deg2rad(lat_deg)
        lon = jnp.deg2rad(lon_deg)
        sl, cl = jnp.sin(lat), jnp.cos(lat)
        so, co = jnp.sin(lon), jnp.cos(lon)
        rot = jnp.array(
            [
                [-so, co, 0.0],
                [-sl * co, -sl * so, cl],
                [cl * co, cl * so, sl],
            ],
            dtype=jnp.float64 if origin.dtype == jnp.float64 else jnp.float32,
        )
        return LocalCartesian(origin_ecef=origin, rot=rot)

    def forward(self, lat_deg, lon_deg, alt):
        """Geodetic -> local ENU xyz (GeographicLib ``Forward``,
        reference `fast_lio_sam.cpp:161`)."""
        ecef = geodetic_to_ecef(lat_deg, lon_deg, alt)
        return jnp.einsum("ij,...j->...i", self.rot, ecef - self.origin_ecef)

    def reverse(self, enu):
        """Local ENU xyz -> geodetic (lat, lon, alt)."""
        ecef = jnp.einsum("ji,...j->...i", self.rot, enu) + self.origin_ecef
        return ecef_to_geodetic(ecef)


# ---------------------------------------------------------------------------
# Transverse Mercator (Krüger series) — backs grid CRSs like HK1980.
# ---------------------------------------------------------------------------


def _tm_forward(lat_deg, lon_deg, lon0_deg, k0, a, f):
    """Ellipsoidal Transverse Mercator forward projection (6th-order Krüger).

    Returns (easting_from_central_meridian, northing_from_equator).
    """
    n = f / (2.0 - f)
    n2, n3 = n * n, n * n * n
    A = a / (1.0 + n) * (1.0 + n2 / 4.0 + n2 * n2 / 64.0)
    alpha = [
        n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0,
        13.0 * n2 / 48.0 - 3.0 * n3 / 5.0,
        61.0 * n3 / 240.0,
    ]
    lat = jnp.deg2rad(lat_deg)
    dlon = jnp.deg2rad(lon_deg - lon0_deg)
    e = jnp.sqrt(f * (2.0 - f))
    # conformal latitude
    t = jnp.sinh(
        jnp.arctanh(jnp.sin(lat)) - e * jnp.arctanh(e * jnp.sin(lat))
    )
    xi = jnp.arctan2(t, jnp.cos(dlon))
    eta = jnp.arctanh(jnp.sin(dlon) / jnp.sqrt(1.0 + t * t))
    x = eta
    y = xi
    for j, aj in enumerate(alpha, start=1):
        x = x + aj * jnp.cos(2.0 * j * xi) * jnp.sinh(2.0 * j * eta)
        y = y + aj * jnp.sin(2.0 * j * xi) * jnp.cosh(2.0 * j * eta)
    return k0 * A * x, k0 * A * y


class TransverseMercatorCRS(NamedTuple):
    """A projected CRS: TM projection + false origin on an ellipsoid."""

    lat0_deg: float
    lon0_deg: float
    k0: float
    false_easting: float
    false_northing: float
    a: float
    f: float

    def forward(self, lat_deg, lon_deg):
        """Geodetic (on this CRS's ellipsoid datum) -> (easting, northing)."""
        x, y = _tm_forward(lat_deg, lon_deg, self.lon0_deg, self.k0, self.a, self.f)
        _, y0 = _tm_forward(
            jnp.asarray(self.lat0_deg), jnp.asarray(self.lon0_deg),
            self.lon0_deg, self.k0, self.a, self.f,
        )
        return x + self.false_easting, y - y0 + self.false_northing


# HK1980 grid (EPSG:2326) on the International 1924 (Hayford) ellipsoid.
# NOTE: a full EPSG:4326->2326 conversion also needs the WGS84->HK1980 datum
# shift (EPSG:1825, dX=-162.619 dY=-276.959 dZ=-161.764 m); applied in
# `wgs84_to_hk1980` below. Capability parity with pyproj usage in the
# reference's `post_process/align_slam_gps_icp.py:71-78`.
INTL1924_A = 6378388.0
INTL1924_F = 1.0 / 297.0
HK1980 = TransverseMercatorCRS(
    lat0_deg=22.0 + 18.0 / 60.0 + 43.68 / 3600.0,
    lon0_deg=114.0 + 10.0 / 60.0 + 42.80 / 3600.0,
    k0=1.0,
    false_easting=836694.05,
    false_northing=819069.80,
    a=INTL1924_A,
    f=INTL1924_F,
)

# plain tuple: a module-level jnp.array would initialize the XLA backend at
# import time, breaking jax.distributed.initialize() in multi-process runs
_HK1980_SHIFT = (-162.619, -276.959, -161.764)


def wgs84_to_hk1980(lat_deg, lon_deg, alt=0.0):
    """WGS84 geodetic -> HK1980 grid (EPSG:4326 -> EPSG:2326 capability).

    Uses the 3-parameter geocentric datum shift then the HK1980 TM grid.
    Returns (easting, northing).
    """
    ecef = geodetic_to_ecef(lat_deg, lon_deg, alt) + jnp.asarray(_HK1980_SHIFT)
    # geodetic on Hayford ellipsoid
    x, y, z = ecef[..., 0], ecef[..., 1], ecef[..., 2]
    e2 = INTL1924_F * (2.0 - INTL1924_F)
    b = INTL1924_A * (1.0 - INTL1924_F)
    lon = jnp.arctan2(y, x)
    p = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(z * INTL1924_A, p * b)
    ep2 = (INTL1924_A**2 - b**2) / (b**2)
    lat = jnp.arctan2(
        z + ep2 * b * jnp.sin(theta) ** 3, p - e2 * INTL1924_A * jnp.cos(theta) ** 3
    )
    for _ in range(2):
        sin_lat = jnp.sin(lat)
        nrad = INTL1924_A / jnp.sqrt(1.0 - e2 * sin_lat * sin_lat)
        h = p / jnp.cos(lat) - nrad
        lat = jnp.arctan2(z, p * (1.0 - e2 * nrad / (nrad + h)))
    return HK1980.forward(jnp.rad2deg(lat), jnp.rad2deg(lon))
