import numpy as np
import jax.numpy as jnp

from fastliosam_tpu.core import se3, so3
from fastliosam_tpu.loop import (
    LoopConfig,
    fetch_closest_keyframe_idx,
    icp_align,
    nearest_neighbors,
    verify_loop,
)


def test_fetch_closest_candidate():
    # keyframes along a line that comes back near the start
    pos = np.zeros((10, 3), np.float32)
    pos[:5, 0] = np.arange(5) * 10  # outbound
    pos[5:, 0] = 40 - np.arange(5) * 10  # inbound
    pos[5:, 1] = 2.0
    stamps = np.arange(10, dtype=np.float32) * 10
    valid = np.ones(10, bool)
    idx, found = fetch_closest_keyframe_idx(
        jnp.asarray(pos), jnp.asarray(stamps), jnp.asarray(valid),
        9, radius=15.0, time_gap=30.0,
    )
    assert bool(found)
    assert int(idx) == 0  # back at the start; frames 5..9 are too recent


def test_fetch_respects_time_gap():
    pos = np.zeros((5, 3), np.float32)
    stamps = np.arange(5, dtype=np.float32)
    valid = np.ones(5, bool)
    idx, found = fetch_closest_keyframe_idx(
        jnp.asarray(pos), jnp.asarray(stamps), jnp.asarray(valid),
        4, radius=100.0, time_gap=30.0,
    )
    assert not bool(found) and int(idx) == -1


def test_nearest_neighbors_bruteforce(rng):
    src = rng.normal(size=(100, 3)).astype(np.float32)
    dst = rng.normal(size=(3000, 3)).astype(np.float32) * 2
    idx, d2 = nearest_neighbors(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones((3000,), bool), chunk=512
    )
    # compare vs numpy brute force
    ref = np.argmin(
        ((src[:, None] - dst[None]) ** 2).sum(-1), axis=1
    )
    np.testing.assert_array_equal(np.asarray(idx), ref)


def test_icp_recovers_transform(rng):
    pts = rng.uniform(-5, 5, size=(2000, 3)).astype(np.float32)
    pts[:, 2] = 0.2 * pts[:, 0] + 0.1 * pts[:, 1]  # non-degenerate surface
    pts[::7, 2] += rng.uniform(0.5, 2.0, size=pts[::7, 2].shape)  # structure
    w = np.array([0.02, -0.03, 0.05], np.float32)
    t = np.array([0.4, -0.3, 0.2], np.float32)
    T_true = se3.make(so3.exp(jnp.asarray(w)), jnp.asarray(t))
    dst = np.asarray(se3.apply(T_true, jnp.asarray(pts)[None])[0])
    T, fitness, n_corr = icp_align(
        jnp.asarray(pts), jnp.ones((2000,), bool),
        jnp.asarray(dst), jnp.ones((2000,), bool),
        max_iterations=20, max_corr_dist=5.0, nn_chunk=512,
    )
    err = np.asarray(se3.log(se3.compose(se3.inverse(T_true), T)))
    assert np.abs(err).max() < 5e-3, err
    assert float(fitness) < 1e-4


def test_verify_loop_accepts_true_loop(rng):
    """Two revisits of the same scene with drifted poses: verify_loop must
    accept and return the drift-correcting relative pose."""
    n_kf, P = 12, 1024
    # scene: many small planar patches with random orientations — rich
    # constraints in all 6 DoF (a sliding-prone surface would stall ICP)
    patches = []
    for _ in range(40):
        c = rng.uniform(-8, 8, size=3)
        c[2] = abs(c[2]) * 0.3
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        u = np.cross(n, [1.0, 0.0, 0.0])
        if np.linalg.norm(u) < 0.1:
            u = np.cross(n, [0.0, 1.0, 0.0])
        u /= np.linalg.norm(u)
        v = np.cross(n, u)
        uv = rng.uniform(-1.0, 1.0, size=(100, 2))
        patches.append(c + uv[:, :1] * u + uv[:, 1:] * v)
    scene = np.concatenate(patches).astype(np.float32)
    clouds = np.zeros((n_kf, P, 3), np.float32)
    masks = np.zeros((n_kf, P), bool)
    poses_np = []
    for k in range(n_kf):
        a = 2 * np.pi * k / n_kf
        p = np.array([3 * np.cos(a), 3 * np.sin(a), 0.5], np.float32)
        R = np.eye(3, dtype=np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3], T[:3, 3] = R, p
        poses_np.append(T)
        # keyframe cloud = scene points near the pose, in body frame
        d = np.linalg.norm(scene - p, axis=1)
        sel = np.argsort(d)[:P]
        clouds[k] = scene[sel] - p
        masks[k] = True
    poses = jnp.asarray(np.stack(poses_np))
    # drift the LAST pose: the loop should recover it
    drift = np.array([0.3, -0.2, 0.1], np.float32)
    poses_drift = poses.at[n_kf - 1, :3, 3].add(jnp.asarray(drift))
    cfg = LoopConfig(
        num_submap_keyframes=0, voxel_res=0.2, submap_points=4096,
        max_iterations=30, nn_chunk=512, radius=10.0, trim_fraction=0.7,
    )
    rel, sqrt_info, accepted, fitness = verify_loop(
        jnp.asarray(clouds), jnp.asarray(masks), poses_drift,
        jnp.ones((n_kf,), bool), n_kf - 1, 0, cfg,
    )
    assert bool(accepted), float(fitness)
    # applying the factor: T_from = poses_drift[11] should satisfy
    # T_from_corrected = T_to · rel⁻¹; the recovered translation correction
    # should cancel the injected drift
    T_to = poses[0]
    T_from_corr = se3.compose(T_to, se3.inverse(rel))
    corr = np.asarray(se3.trans(T_from_corr) - se3.trans(poses[n_kf - 1]))
    # trimmed ICP on partially-overlapping submaps: the loop factor should
    # cancel most of the injected 0.37 m drift
    assert np.linalg.norm(corr) < 0.12, corr


def test_aniso_loop_noise_softens_degenerate_axis(rng):
    """Canyon robustness: a corridor-like destination submap (walls + floor,
    nothing facing the travel axis) must yield a soft translation factor
    along x while keeping y/z at full strength; a geometry-rich box keeps
    all axes strong. This is the defense against accepted-but-slid ICP
    loops (13-15 m along-street errors measured on the circuit)."""
    import jax.numpy as jnp

    from fastliosam_tpu.loop.closure import (
        LoopConfig, _aniso_translation_scales,
    )

    cfg = LoopConfig()
    n = 4096
    # corridor: two walls (normals +-y) + floor (normal z), long in x
    walls = np.concatenate([
        np.stack([rng.uniform(0, 40, n // 3), np.full(n // 3, 4.0),
                  rng.uniform(0, 5, n // 3)], 1),
        np.stack([rng.uniform(0, 40, n // 3), np.full(n // 3, -4.0),
                  rng.uniform(0, 5, n // 3)], 1),
        np.stack([rng.uniform(0, 40, n - 2 * (n // 3)),
                  rng.uniform(-4, 4, n - 2 * (n // 3)),
                  np.zeros(n - 2 * (n // 3))], 1),
    ]).astype(np.float32)
    mask = jnp.ones((n,), bool)
    sc = np.asarray(_aniso_translation_scales(
        jnp.asarray(walls), mask, jnp.eye(3, dtype=jnp.float32), cfg
    ))
    assert sc[0] <= 0.2, sc  # x unconstrained -> soft
    assert sc[1] >= 0.8 and sc[2] >= 0.5, sc

    # box: all six faces visible -> every axis constrained
    m3 = n // 3
    box = np.concatenate([
        np.stack([np.full(m3, 10.0), rng.uniform(-4, 4, m3),
                  rng.uniform(0, 5, m3)], 1),
        np.stack([rng.uniform(0, 20, m3), np.full(m3, 4.0),
                  rng.uniform(0, 5, m3)], 1),
        np.stack([rng.uniform(0, 20, n - 2 * m3),
                  rng.uniform(-4, 4, n - 2 * m3), np.zeros(n - 2 * m3)], 1),
    ]).astype(np.float32)
    sc2 = np.asarray(_aniso_translation_scales(
        jnp.asarray(box), mask, jnp.eye(3, dtype=jnp.float32), cfg
    ))
    assert np.all(sc2 >= 0.5), sc2


def test_icp_p2pl_converges_on_structured_scene(rng):
    """Point-to-plane ICP option: converges on a walls+floor scene from a
    1.5 m offset initialization, using surfel normals from the destination
    voxel map (the loop verifier's plumbing)."""
    import jax.numpy as jnp

    from fastliosam_tpu.core import se3
    from fastliosam_tpu.loop.closure import LoopConfig, _dst_surfel_map
    from fastliosam_tpu.loop.icp import icp_align_p2pl
    from fastliosam_tpu.map import voxel_hash as vh

    n = 3072
    m3 = n // 3
    dst = np.concatenate([
        np.stack([rng.uniform(0, 20, m3), rng.uniform(-6, 6, m3),
                  np.zeros(m3)], 1),
        np.stack([rng.uniform(0, 20, m3), np.full(m3, 6.0),
                  rng.uniform(0, 4, m3)], 1),
        np.stack([np.full(n - 2 * m3, 20.0),
                  rng.uniform(-6, 6, n - 2 * m3),
                  rng.uniform(0, 4, n - 2 * m3)], 1),
    ]).astype(np.float32)
    mask = jnp.ones((n,), bool)
    T_true = se3.make(
        jnp.eye(3, dtype=jnp.float32), jnp.asarray([1.2, -0.8, 0.4])
    )
    src = se3.apply(se3.inverse(T_true), jnp.asarray(dst)[None])[0]

    cfg = LoopConfig()
    dmap, dcfg = _dst_surfel_map(jnp.asarray(dst), mask, cfg)
    nrm, _, nvalid = vh.query_planes(dmap, dcfg, jnp.asarray(dst), mask)
    T, fitness, n_corr = icp_align_p2pl(
        src, mask, jnp.asarray(dst), mask, nrm, nvalid,
        max_iterations=30, max_corr_dist=10.0, trim_fraction=0.9,
    )
    err = np.asarray(se3.log(se3.compose(se3.inverse(T_true), T)))
    assert np.abs(err).max() < 0.05, err
    assert int(n_corr) > 2000


def test_multistart_widens_icp_basin(rng):
    """Multi-start verification (LoopConfig.icp_multistart): on a scene
    whose structure repeats along one axis, single-start ICP from a
    drift-scale initial offset locks into a lattice-slid local minimum;
    the multi-start coarse search along the weak-coverage axis must find
    the true basin (fitness no worse than single-start, correction close
    to the injected drift)."""
    import jax.numpy as jnp

    from fastliosam_tpu.core import se3
    from fastliosam_tpu.loop.closure import LoopConfig, verify_loop

    # canyon scene: two walls perpendicular to y + ground, with sparse
    # REPEATING x-facing features every 6 m + one unique wide anchor
    pts = []
    xs = rng.uniform(-18, 18, size=1500)
    for ywall in (-5.0, 5.0):
        pts.append(np.stack([xs, np.full_like(xs, ywall),
                             rng.uniform(0, 4, size=len(xs))], 1))
    gx = rng.uniform(-18, 18, size=1200)
    pts.append(np.stack([gx, rng.uniform(-5, 5, size=len(gx)),
                         np.zeros_like(gx)], 1))
    for k in range(-3, 4):  # repeating lattice features (period 6 m)
        yy = rng.uniform(-5, -4, size=80)
        pts.append(np.stack([np.full_like(yy, 6.0 * k),
                             yy, rng.uniform(0, 2, size=len(yy))], 1))
    # unique anchor: a wide block face at x=8.7 (breaks the lattice)
    yy = rng.uniform(2, 5, size=300)
    pts.append(np.stack([np.full_like(yy, 8.7), yy,
                         rng.uniform(0, 3.5, size=len(yy))], 1))
    scene = np.concatenate(pts).astype(np.float32)

    P = 4096
    n_kf = 2
    clouds = np.zeros((n_kf, P, 3), np.float32)
    masks = np.ones((n_kf, P), bool)
    sel = rng.permutation(len(scene))[:P]
    clouds[0] = scene[sel]
    clouds[1] = scene[rng.permutation(len(scene))[:P]]
    # keyframe 1 truly sits at the same place as keyframe 0, but its
    # estimated pose carries 7 m of along-canyon drift (not a multiple of
    # the 6 m lattice period)
    # (clouds[1] is already the body-frame view from the TRUE pose —
    # identity — so the estimated pose shifts its world placement by 7 m)
    poses = np.broadcast_to(np.eye(4, dtype=np.float32),
                            (n_kf, 4, 4)).copy()
    poses[1, 0, 3] = 7.0

    base = dict(num_submap_keyframes=0, voxel_res=0.2, submap_points=4096,
                max_iterations=40, nn_chunk=512, radius=10.0,
                trim_fraction=0.8, icp_score_threshold=1.5)
    cfg1 = LoopConfig(**base)
    cfg5 = LoopConfig(**base, icp_multistart=5, multistart_step=3.5,
                      multistart_iters=10)
    args = (jnp.asarray(clouds), jnp.asarray(masks), jnp.asarray(poses),
            jnp.ones((n_kf,), bool), 1, 0)
    rel1, _, acc1, fit1 = verify_loop(*args, cfg1)
    rel5, _, acc5, fit5 = verify_loop(*args, cfg5)
    assert float(fit5) <= float(fit1) + 1e-4
    # the multistart correction recovers the 7 m drift: applying the
    # factor puts keyframe 1 back at the true pose (identity translation)
    T_corr = se3.compose(jnp.asarray(poses[0]), se3.inverse(rel5))
    err5 = float(np.linalg.norm(np.asarray(se3.trans(T_corr))))
    assert err5 < 1.0, err5
