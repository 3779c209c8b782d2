"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4:
multi-host story via xla_force_host_platform_device_count)."""
import numpy as np
import jax
import jax.numpy as jnp

from fastliosam_tpu.core import se3
from fastliosam_tpu.parallel import make_mesh, shard_leading, sharded_gram, solve_sharded
from fastliosam_tpu.pgo import PoseGraphConfig, add_between, add_gps, solve
from tests.test_pgo import build_noisy_chain, circle_poses, pose_errors

# smaller than test_pgo's CFG: on the 8-virtual-device CPU mesh every PCG
# iteration is 8 thread-level psums on a 2-core box, so iteration counts
# dominate the suite's wall time; equivalence holds at any count as long
# as BOTH sides use the same cfg
SH_CFG = PoseGraphConfig(
    max_keyframes=64, max_between=128, max_gps=32, lm_iters=5, pcg_iters=48
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_solve_matches_single_device(rng):
    gt = circle_poses(24)
    g = build_noisy_chain(gt, rng, odom_noise=0.05, rot_noise=0.01)
    rel = se3.between(gt[-1], gt[0])
    g = add_between(
        g, 23, 0, rel, jnp.asarray([100.0] * 3 + [1000.0] * 3, jnp.float32)
    )
    for k in range(0, 24, 4):
        g = add_gps(
            g, k, se3.trans(gt[k]), jnp.full((3,), 10.0, jnp.float32)
        )
    g_ref, cost_ref = solve(g, SH_CFG, prior_pose=g.poses[0])
    mesh = make_mesh(8)
    g_sh, cost_sh = solve_sharded(g, SH_CFG, mesh)
    assert abs(float(cost_sh) - float(cost_ref)) < 1e-2 * max(1.0, float(cost_ref))
    err = np.abs(np.asarray(g_sh.poses) - np.asarray(g_ref.poses)).max()
    assert err < 5e-3, err


def test_sharded_solve_corrects_drift(rng):
    gt = circle_poses(32)
    # SAME config as test_sharded_solve_matches_single_device: the jitted
    # shard_map program is cached per (config, mesh, axis), so sharing the
    # config makes this test reuse that compile (~150 s saved on the
    # 2-core CPU box; the 8-device sharded LM+PCG is the single most
    # expensive compile in the suite)
    cfg = SH_CFG
    g = build_noisy_chain(gt, rng, odom_noise=0.05, rot_noise=0.01)
    rel = se3.between(gt[-1], gt[0])
    g = add_between(
        g, 31, 0, rel, jnp.asarray([100.0] * 3 + [1000.0] * 3, jnp.float32)
    )
    before = pose_errors(g, gt)
    mesh = make_mesh(8)
    g2, _ = solve_sharded(g, cfg, mesh)
    after = pose_errors(g2, gt)
    assert after.mean() < 0.7 * before.mean() + 1e-3


def test_sharded_gram_matches_dense(rng):
    n = 1024
    A = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    w = jnp.asarray((rng.uniform(size=n) > 0.3).astype(np.float32))
    r = jnp.asarray(rng.normal(size=n).astype(np.float32))
    mesh = make_mesh(8, axis="pt")
    A_s = shard_leading(mesh, A, "pt")
    w_s = shard_leading(mesh, w, "pt")
    r_s = shard_leading(mesh, r, "pt")
    G, b, nv = sharded_gram(A_s, w_s, r_s, mesh)
    G_ref = np.asarray(A.T @ (A * w[:, None]))
    b_ref = np.asarray((A * w[:, None]).T @ r)
    np.testing.assert_allclose(np.asarray(G), G_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(b), b_ref, rtol=1e-4, atol=1e-3)
    assert int(nv) == int(np.sum(np.asarray(w) > 0))


def test_detect_sharded_matches_replicated(rng):
    from fastliosam_tpu.loop.detect import fetch_closest_keyframe_idx
    from fastliosam_tpu.parallel import detect_sharded

    K = 64
    pos = jnp.asarray(rng.uniform(-40, 40, size=(K, 3)), jnp.float32)
    stamps = jnp.asarray(np.arange(K) * 0.7, jnp.float32)
    valid = jnp.asarray(np.arange(K) < 50)
    mesh = make_mesh(8)
    for q in (49, 30, 5):
        i_ref, f_ref = fetch_closest_keyframe_idx(
            pos, stamps, valid, q, radius=30.0, time_gap=10.0
        )
        i_sh, f_sh = detect_sharded(
            pos, stamps, valid, q, radius=30.0, time_gap=10.0, mesh=mesh
        )
        assert bool(f_sh) == bool(f_ref)
        assert int(i_sh) == int(i_ref)


def test_gather_submap_sharded(rng):
    from fastliosam_tpu.parallel import gather_submap_sharded

    K, P = 32, 64
    clouds = jnp.asarray(rng.normal(size=(K, P, 3)), jnp.float32)
    masks = jnp.asarray(rng.random((K, P)) > 0.3)
    mesh = make_mesh(8)
    n_sub = 3
    for c in (0, 15, 31):
        win_c, win_m = gather_submap_sharded(clouds, masks, c, n_sub, mesh)
        offs = np.arange(-n_sub, n_sub + 1)
        for s, o in enumerate(offs):
            t = c + o
            if 0 <= t < K:
                np.testing.assert_allclose(
                    np.asarray(win_c[s]), np.asarray(clouds[t]), atol=1e-6
                )
                np.testing.assert_array_equal(
                    np.asarray(win_m[s]), np.asarray(masks[t])
                )
            else:
                assert not np.asarray(win_m[s]).any()


def test_icp_sharded_matches_replicated(rng):
    from fastliosam_tpu.loop.icp import icp_align
    from fastliosam_tpu.parallel import icp_align_sharded

    n = 1024
    base = rng.uniform(-20, 20, size=(n, 3)).astype(np.float32)
    base[:, 2] = np.sin(base[:, 0] * 0.4) + 0.2 * base[:, 1]
    ang = 0.05
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1.0]], np.float32,
    )
    src = jnp.asarray(base @ R.T + np.array([0.8, -0.5, 0.2], np.float32))
    dst = jnp.asarray(base)
    mask = jnp.ones((n,), bool)
    T_ref, fit_ref, nc_ref = icp_align(
        src, mask, dst, mask, max_iterations=30, max_corr_dist=10.0,
        nn_chunk=256, trim_fraction=1.0,
    )
    mesh = make_mesh(8)
    T_sh, fit_sh, nc_sh = icp_align_sharded(
        src, mask, dst, mask, mesh, max_iterations=30, max_corr_dist=10.0,
        nn_chunk=256,
    )
    assert int(nc_sh) == int(nc_ref)
    assert abs(float(fit_sh) - float(fit_ref)) < 1e-5
    np.testing.assert_allclose(np.asarray(T_sh), np.asarray(T_ref), atol=1e-4)
    # and it actually aligned
    assert float(fit_sh) < 1e-3


def test_sharded_voxel_map_matches_replicated(rng):
    """Slot-range-sharded map (VERDICT r2 #8): insert + merged3 query on the
    8-device mesh match the single-device map."""
    from fastliosam_tpu.map import VoxelMapConfig, insert, make_map
    from fastliosam_tpu.map.voxel_hash import query_planes_merged3
    from fastliosam_tpu.parallel.sharded_map import (
        insert_sharded, make_map_sharded, query_planes_merged3_sharded,
    )

    # 2^12 slots / 768 points: equivalence is size-independent (the probe
    # and claim logic is exercised identically) and the 2^14/2048 original
    # cost 347 s of this 2-core box's suite wall-time (VERDICT r3 weak #7)
    cfg = VoxelMapConfig(capacity=1 << 12, voxel_size=0.5, min_points=5)
    mesh = make_mesh(8)
    # surface-like points so planes are actually valid
    n = 768
    pts = np.stack([
        rng.uniform(-8, 8, n), rng.uniform(-8, 8, n),
        0.05 * rng.standard_normal(n),
    ], 1).astype(np.float32)
    mask = jnp.asarray(rng.uniform(size=n) > 0.1)
    pts = jnp.asarray(pts)

    m_ref = make_map(cfg)
    m_ref, drop_ref = insert(m_ref, cfg, pts, mask, refresh_planes=False)
    m_sh = make_map_sharded(cfg, mesh)
    m_sh, drop_sh = insert_sharded(m_sh, cfg, pts, mask, mesh)
    assert int(drop_sh) == int(drop_ref)
    # table contents identical (same slots, same moments)
    np.testing.assert_array_equal(np.asarray(m_sh.fp), np.asarray(m_ref.fp))
    np.testing.assert_allclose(
        np.asarray(m_sh.moments), np.asarray(m_ref.moments), rtol=1e-6, atol=1e-5
    )

    q = pts + jnp.asarray(rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32))
    n_ref, d_ref, v_ref, c_ref = query_planes_merged3(m_ref, cfg, q, mask)
    n_sh, d_sh, v_sh, c_sh = query_planes_merged3_sharded(
        m_sh, cfg, q, mask, mesh)
    np.testing.assert_array_equal(np.asarray(v_sh), np.asarray(v_ref))
    # rvar compared on VALID rows only: invalid rows exercise the
    # degenerate-eigenvector fallback whose output is rounding-sensitive
    # (eager-vs-jit fusion differs) — and is multiplied by valid=0 in the
    # iEKF weight, so it carries no behavior
    vr0 = np.asarray(v_ref)
    np.testing.assert_allclose(
        np.asarray(c_sh)[vr0], np.asarray(c_ref)[vr0], rtol=1e-3, atol=1e-5)
    vr = np.asarray(v_ref)
    np.testing.assert_allclose(
        np.asarray(n_sh)[vr], np.asarray(n_ref)[vr], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(d_sh)[vr], np.asarray(d_ref)[vr], rtol=1e-4, atol=1e-3
    )

    # second insert batch exercises match-vs-claim against existing entries
    pts2 = pts + jnp.asarray(
        rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32))
    m_ref2, _ = insert(m_ref, cfg, pts2, mask, refresh_planes=False)
    m_sh2, _ = insert_sharded(m_sh, cfg, pts2, mask, mesh)
    np.testing.assert_array_equal(np.asarray(m_sh2.fp), np.asarray(m_ref2.fp))
    np.testing.assert_allclose(
        np.asarray(m_sh2.moments), np.asarray(m_ref2.moments),
        rtol=1e-6, atol=1e-5,
    )


def test_sharded_odom_step_matches_replicated(rng):
    """Full odometry steps over the slot-sharded voxel map (VERDICT r3 #5):
    the SAME odom_step program with the sharded map backend (query + insert
    + FoV eviction across the 8-device mesh) reproduces the replicated
    trajectory. This is the MulRan-Riverside N>=2-host configuration's
    odometry path (BASELINE.json config #5)."""
    from fastliosam_tpu.map import VoxelMapConfig
    from fastliosam_tpu.odom import (
        ImuBatch, OdomConfig, Scan, init_odom, odom_step,
    )
    from fastliosam_tpu.parallel import shard_map_arrays, sharded_map_ops

    mesh = make_mesh(8)
    map_cfg = VoxelMapConfig(capacity=1 << 13, voxel_size=0.5, min_points=4)
    odom_cfg = OdomConfig(
        point_filter_num=1, blind=0.1, num_ds_points=512,
        max_imu_per_scan=4, query_mode="merged3", evict_every=3,
        det_range=60.0,
    )
    n_pts, n_imu, n_steps = 1024, 4, 4

    def mk_scan(k):
        r = np.random.default_rng(100 + k)
        # two walls + floor so planes are valid and the update is exercised
        pts = np.concatenate([
            np.stack([r.uniform(-8, 8, 400), r.uniform(-8, 8, 400),
                      np.full(400, -1.0)], 1),
            np.stack([np.full(312, 8.0), r.uniform(-8, 8, 312),
                      r.uniform(-1, 3, 312)], 1),
            np.stack([r.uniform(-8, 8, 312), np.full(312, -8.0),
                      r.uniform(-1, 3, 312)], 1),
        ]).astype(np.float32)
        return Scan(
            xyz=jnp.asarray(pts),
            t_offset=jnp.asarray(
                np.linspace(0, 0.1, n_pts, endpoint=False).astype(np.float32)
            ),
            mask=jnp.ones((n_pts,), bool),
        )

    def mk_imu(k):
        r = np.random.default_rng(200 + k)
        return ImuBatch(
            stamps=jnp.asarray(
                np.linspace(0, 0.1, n_imu, endpoint=False).astype(np.float32)
            ),
            gyro=jnp.asarray(r.normal(size=(n_imu, 3)).astype(np.float32) * 0.01),
            acc=jnp.asarray(
                (r.normal(size=(n_imu, 3)) * 0.01 + [0, 0, 9.81]).astype(
                    np.float32
                )
            ),
            mask=jnp.ones((n_imu,), bool),
        )

    dt = jnp.float32(0.1)
    step_ref = jax.jit(
        lambda s, sc, im: odom_step(s, sc, im, dt, odom_cfg, map_cfg)
    )
    ops = sharded_map_ops(mesh)
    step_sh = jax.jit(
        lambda s, sc, im: odom_step(s, sc, im, dt, odom_cfg, map_cfg,
                                    map_ops=ops)
    )

    s_ref = init_odom(map_cfg, odom_cfg)
    s_sh = init_odom(map_cfg, odom_cfg)
    s_sh = s_sh._replace(vmap=shard_map_arrays(s_sh.vmap, mesh))
    for k in range(n_steps):
        sc, im = mk_scan(k), mk_imu(k)
        s_ref, aux_ref = step_ref(s_ref, sc, im)
        s_sh, aux_sh = step_sh(s_sh, sc, im)
        np.testing.assert_allclose(
            np.asarray(aux_sh["p"]), np.asarray(aux_ref["p"]),
            rtol=0, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(aux_sh["R"]), np.asarray(aux_ref["R"]),
            rtol=0, atol=1e-4,
        )
        assert int(aux_sh["n_matched"]) == int(aux_ref["n_matched"])
    # map tables agree after inserts + the k=2 eviction pass
    np.testing.assert_array_equal(
        np.asarray(s_sh.vmap.fp), np.asarray(s_ref.vmap.fp)
    )
    np.testing.assert_allclose(
        np.asarray(s_sh.vmap.moments), np.asarray(s_ref.vmap.moments),
        rtol=1e-5, atol=1e-4,
    )
