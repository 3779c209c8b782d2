import numpy as np
import jax
import jax.numpy as jnp

from fastliosam_tpu.map import (
    VoxelMapConfig,
    make_map,
    insert,
    query_planes,
    query_planes_merged,
    evict_far,
    occupied_centroids,
)

CFG = VoxelMapConfig(capacity=1 << 14, voxel_size=0.5, min_points=5)


def plane_points(rng, n, normal, d, extent=5.0, noise=0.0):
    """Random points on plane n·x + d = 0."""
    normal = np.asarray(normal, dtype=np.float64)
    normal = normal / np.linalg.norm(normal)
    # basis of the plane
    a = np.array([1.0, 0.0, 0.0])
    if abs(normal @ a) > 0.9:
        a = np.array([0.0, 1.0, 0.0])
    u = np.cross(normal, a)
    u /= np.linalg.norm(u)
    v = np.cross(normal, u)
    uv = rng.uniform(-extent, extent, size=(n, 2))
    pts = uv[:, :1] * u + uv[:, 1:] * v - d * normal
    pts = pts + rng.normal(size=(n, 3)) * noise
    return pts.astype(np.float32)


def test_insert_query_ground_plane(rng):
    pts = plane_points(rng, 4000, [0, 0, 1], -1.0)  # plane z = 1
    m = make_map(CFG)
    m, dropped = insert(m, CFG, jnp.asarray(pts), jnp.ones((4000,), bool))
    assert int(dropped) == 0
    q = rng.uniform(-4, 4, size=(64, 2)).astype(np.float32)
    qpts = np.column_stack([q, np.full((64,), 1.0, np.float32)]).astype(np.float32)
    normal, d, valid = query_planes(m, CFG, jnp.asarray(qpts), jnp.ones((64,), bool))
    normal, d, valid = map(np.asarray, (normal, d, valid))
    assert valid.mean() > 0.9
    nz = np.abs(normal[valid][:, 2])
    np.testing.assert_allclose(nz, 1.0, atol=2e-2)
    # plane passes through z=1: residual n·p + d ~ 0 at query points
    res = np.abs(np.sum(normal[valid] * qpts[valid], axis=1) + d[valid])
    assert res.max() < 0.05


def test_merged_query_matches_plane(rng):
    pts = plane_points(rng, 4000, [0.3, -0.2, 1.0], 0.5, noise=0.005)
    m = make_map(CFG)
    m, _ = insert(m, CFG, jnp.asarray(pts), jnp.ones((4000,), bool))
    qpts = plane_points(rng, 64, [0.3, -0.2, 1.0], 0.5)
    normal, d, valid, conf = query_planes_merged(
        m, CFG, jnp.asarray(qpts), jnp.ones((64,), bool)
    )
    normal, d, valid = map(np.asarray, (normal, d, valid))
    assert valid.mean() > 0.9
    res = np.abs(np.sum(normal[valid] * qpts[valid], axis=1) + d[valid])
    assert np.median(res) < 0.05


def test_no_duplicate_voxels(rng):
    """Insert the same points twice — the voxel count must not grow."""
    pts = rng.uniform(-10, 10, size=(2000, 3)).astype(np.float32)
    m = make_map(CFG)
    m, _ = insert(m, CFG, jnp.asarray(pts), jnp.ones((2000,), bool))
    occ1 = int(jnp.sum(m.occupied))
    m, _ = insert(m, CFG, jnp.asarray(pts), jnp.ones((2000,), bool))
    occ2 = int(jnp.sum(m.occupied))
    assert occ1 == occ2
    # counts doubled where not saturated
    assert float(jnp.sum(m.count)) == 4000.0


def test_masked_points_ignored(rng):
    pts = rng.uniform(-10, 10, size=(100, 3)).astype(np.float32)
    mask = np.zeros((100,), bool)
    mask[:50] = True
    m = make_map(CFG)
    m, _ = insert(m, CFG, jnp.asarray(pts), jnp.asarray(mask))
    assert float(jnp.sum(m.count)) == 50.0


def test_eviction(rng):
    near = rng.uniform(-2, 2, size=(500, 3)).astype(np.float32)
    far = (rng.uniform(-2, 2, size=(500, 3)) + 100.0).astype(np.float32)
    m = make_map(CFG)
    m, _ = insert(m, CFG, jnp.asarray(np.vstack([near, far])), jnp.ones((1000,), bool))
    occ_before = int(jnp.sum(m.occupied))
    m = evict_far(m, CFG, jnp.zeros(3), 50.0)
    occ_after = int(jnp.sum(m.occupied))
    assert occ_after < occ_before
    pts, occ = occupied_centroids(m, CFG)
    pts = np.asarray(pts)[np.asarray(occ)]
    assert np.all(np.linalg.norm(pts, axis=1) < 50.0)
    # far points must be queryable no more
    _, _, valid = query_planes(m, CFG, jnp.asarray(far), jnp.ones((500,), bool))
    assert not np.any(np.asarray(valid))


def test_insert_after_eviction_no_duplicates(rng):
    """Eviction holes must not lead to duplicate voxel entries on re-insert."""
    pts = rng.uniform(-20, 20, size=(3000, 3)).astype(np.float32)
    m = make_map(CFG)
    m, _ = insert(m, CFG, jnp.asarray(pts), jnp.ones((3000,), bool))
    m = evict_far(m, CFG, jnp.zeros(3), 10.0)
    m, _ = insert(m, CFG, jnp.asarray(pts), jnp.ones((3000,), bool))
    coords = np.asarray(m.coords)[np.asarray(m.occupied) > 0]
    uniq = np.unique(coords, axis=0)
    assert len(uniq) == len(coords), "duplicate voxel entries found"


def test_insert_jit_compatible(rng):
    pts = jnp.asarray(rng.uniform(-10, 10, size=(512, 3)).astype(np.float32))
    mask = jnp.ones((512,), bool)
    m = make_map(CFG)

    @jax.jit
    def step(m, pts, mask):
        return insert(m, CFG, pts, mask)

    m2, dropped = step(m, pts, mask)
    assert int(jnp.sum(m2.count)) == 512
    assert int(dropped) == 0


def test_vertical_wall_plane(rng):
    # wall x = 3
    pts = plane_points(rng, 12000, [1, 0, 0], -3.0, noise=0.003)
    m = make_map(CFG)
    m, _ = insert(m, CFG, jnp.asarray(pts), jnp.ones((len(pts),), bool))
    qpts = plane_points(rng, 32, [1, 0, 0], -3.0)
    normal, d, valid = query_planes(m, CFG, jnp.asarray(qpts), jnp.ones((32,), bool))
    normal, valid = np.asarray(normal), np.asarray(valid)
    assert valid.mean() > 0.8
    assert np.all(np.abs(normal[valid][:, 0]) > 0.99)


def test_merged2_query_matches_plane(rng):
    from fastliosam_tpu.map import query_planes_merged2

    pts = plane_points(rng, 4000, [0.3, -0.2, 1.0], 0.5, noise=0.005)
    m = make_map(CFG)
    m, _ = insert(m, CFG, jnp.asarray(pts), jnp.ones((4000,), bool))
    qpts = plane_points(rng, 64, [0.3, -0.2, 1.0], 0.5)
    normal, d, valid, conf = query_planes_merged2(
        m, CFG, jnp.asarray(qpts), jnp.ones((64,), bool)
    )
    normal, d, valid = map(np.asarray, (normal, d, valid))
    assert valid.mean() > 0.85
    res = np.abs(np.sum(normal[valid] * qpts[valid], axis=1) + d[valid])
    assert np.median(res) < 0.05


def test_merged3_query_matches_plane(rng):
    from fastliosam_tpu.map import query_planes_merged3

    pts = plane_points(rng, 4000, [0.3, -0.2, 1.0], 0.5, noise=0.005)
    m = make_map(CFG)
    m, _ = insert(m, CFG, jnp.asarray(pts), jnp.ones((4000,), bool))
    qpts = plane_points(rng, 64, [0.3, -0.2, 1.0], 0.5)
    normal, d, valid, conf = query_planes_merged3(
        m, CFG, jnp.asarray(qpts), jnp.ones((64,), bool)
    )
    normal, d, valid = map(np.asarray, (normal, d, valid))
    assert valid.mean() > 0.85
    res = np.abs(np.sum(normal[valid] * qpts[valid], axis=1) + d[valid])
    assert np.median(res) < 0.05
    # the two chosen neighbors differ per point and never equal the center
    # (covered implicitly by the residual check; also sanity: masked query)
    n2, d2, v2, c2 = query_planes_merged3(
        m, CFG, jnp.asarray(qpts), jnp.zeros((64,), bool)
    )
    assert not np.asarray(v2).any()
