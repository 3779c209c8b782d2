import numpy as np
import jax.numpy as jnp

from fastliosam_tpu.core import eigh3, geodesy
from fastliosam_tpu.core.pointcloud import (
    Cloud,
    make_cloud,
    voxel_downsample,
    stride_filter,
    blind_filter,
    compact,
)


def random_sym3(rng, n):
    A = rng.normal(size=(n, 3, 3))
    return ((A + A.transpose(0, 2, 1)) * 0.5).astype(np.float32)


def test_eigvals_match_numpy(rng):
    A = random_sym3(rng, 256)
    lam = np.asarray(eigh3.eigvalsh3(jnp.asarray(A)))
    lam_ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(lam, lam_ref, atol=1e-4)


def test_eigvecs_are_eigvecs(rng):
    A = random_sym3(rng, 128)
    lam, V = eigh3.eigh3(jnp.asarray(A))
    lam, V = np.asarray(lam), np.asarray(V)
    for i in range(3):
        res = np.einsum("nij,nj->ni", A, V[:, :, i]) - lam[:, i : i + 1] * V[:, :, i]
        assert np.max(np.abs(res)) < 5e-3
    # orthonormality
    VtV = np.einsum("nij,nik->njk", V, V)
    np.testing.assert_allclose(VtV, np.eye(3)[None].repeat(128, 0), atol=1e-3)


def test_smallest_eigvec_is_plane_normal(rng):
    # points on plane z = 0.3x + 0.1y -> covariance smallest eigvec ~ normal
    n = 500
    xy = rng.normal(size=(n, 2))
    z = 0.3 * xy[:, 0] + 0.1 * xy[:, 1]
    pts = np.column_stack([xy, z]).astype(np.float32)
    pts -= pts.mean(0)
    cov = (pts.T @ pts) / n
    normal, lam = eigh3.smallest_eigvec3(jnp.asarray(cov[None]))
    normal = np.asarray(normal)[0]
    expected = np.array([-0.3, -0.1, 1.0])
    expected /= np.linalg.norm(expected)
    assert abs(abs(normal @ expected) - 1.0) < 1e-4
    assert np.asarray(lam)[0, 0] < 1e-6


def test_voxel_downsample_centroids():
    pts = np.array(
        [
            [0.1, 0.1, 0.1],
            [0.3, 0.3, 0.3],  # same 0.5-voxel as above
            [1.1, 0.1, 0.1],  # different voxel
        ],
        dtype=np.float32,
    )
    c = make_cloud(pts, capacity=8)
    out = voxel_downsample(c, 0.5)
    got = np.asarray(out.xyz)[np.asarray(out.mask)]
    got = got[np.lexsort(got.T)]
    expected = np.array([[0.2, 0.2, 0.2], [1.1, 0.1, 0.1]], dtype=np.float32)
    expected = expected[np.lexsort(expected.T)]
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_voxel_downsample_ignores_padding(rng):
    pts = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    c = make_cloud(pts, capacity=256)
    out = voxel_downsample(c, 0.5)
    assert int(out.count()) <= 100
    valid = np.asarray(out.xyz)[np.asarray(out.mask)]
    assert np.all(np.abs(valid) < 10.0)


def test_stride_blind_compact(rng):
    pts = rng.uniform(-5, 5, size=(64, 3)).astype(np.float32)
    c = make_cloud(pts, capacity=64)
    s = stride_filter(c, 4)
    assert int(s.count()) == 16
    b = blind_filter(c, 4.0)
    d = np.linalg.norm(pts, axis=1)
    assert int(b.count()) == int((d > 4.0).sum())
    packed = compact(b)
    m = np.asarray(packed.mask)
    assert m[: m.sum()].all() and not m[m.sum() :].any()


def test_local_cartesian_roundtrip():
    lc = geodesy.LocalCartesian.from_origin(22.3193, 114.1694, 10.0)
    lat, lon, alt = 22.3250, 114.1750, 30.0
    enu = lc.forward(jnp.asarray(lat), jnp.asarray(lon), jnp.asarray(alt))
    enu = np.asarray(enu)
    # ~0.63 km north, ~0.58 km east
    assert 400 < enu[0] < 800 and 400 < enu[1] < 800
    la2, lo2, al2 = lc.reverse(jnp.asarray(enu))
    assert abs(float(la2) - lat) < 1e-5
    assert abs(float(lo2) - lon) < 1e-5
    assert abs(float(al2) - alt) < 0.1


def test_local_cartesian_at_origin():
    lc = geodesy.LocalCartesian.from_origin(22.3193, 114.1694, 10.0)
    enu = np.asarray(lc.forward(jnp.asarray(22.3193), jnp.asarray(114.1694), jnp.asarray(10.0)))
    np.testing.assert_allclose(enu, np.zeros(3), atol=0.5)


def test_ecef_roundtrip():
    lat, lon, alt = 48.8584, 2.2945, 330.0
    ecef = geodesy.geodetic_to_ecef(jnp.asarray(lat), jnp.asarray(lon), jnp.asarray(alt))
    la, lo, al = geodesy.ecef_to_geodetic(ecef)
    assert abs(float(la) - lat) < 1e-5
    assert abs(float(lo) - lon) < 1e-5
    assert abs(float(al) - alt) < 1.0


def test_hk1980_known_point():
    # HK1980 grid origin maps to the false origin by construction.
    e, n = geodesy.HK1980.forward(
        jnp.asarray(geodesy.HK1980.lat0_deg), jnp.asarray(geodesy.HK1980.lon0_deg)
    )
    assert abs(float(e) - 836694.05) < 0.1
    assert abs(float(n) - 819069.80) < 0.1
    # A WGS84 point in Hong Kong should land within the HK1980 grid bounds.
    e, n = geodesy.wgs84_to_hk1980(jnp.asarray(22.3193), jnp.asarray(114.1694))
    assert 800000 < float(e) < 860000
    assert 800000 < float(n) < 840000
