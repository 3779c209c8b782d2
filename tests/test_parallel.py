"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4:
multi-host story via xla_force_host_platform_device_count)."""
import numpy as np
import jax
import jax.numpy as jnp

from fastliosam_tpu.core import se3
from fastliosam_tpu.parallel import make_mesh, shard_leading, sharded_gram, solve_sharded
from fastliosam_tpu.pgo import PoseGraphConfig, add_between, add_gps, solve
from tests.test_pgo import CFG, build_noisy_chain, circle_poses, pose_errors


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
    g_ref, cost_ref = solve(g, CFG, prior_pose=g.poses[0])
    mesh = make_mesh(8)
    g_sh, cost_sh = solve_sharded(g, CFG, mesh)
    assert abs(float(cost_sh) - float(cost_ref)) < 1e-2 * max(1.0, float(cost_ref))
    err = np.abs(np.asarray(g_sh.poses) - np.asarray(g_ref.poses)).max()
    assert err < 5e-3, err


def test_sharded_solve_corrects_drift(rng):
    gt = circle_poses(32)
    cfg = PoseGraphConfig(max_keyframes=64, max_between=128, max_gps=32,
                          lm_iters=10, pcg_iters=96)
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
