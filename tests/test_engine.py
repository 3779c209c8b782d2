"""End-to-end engine tests: full pipeline on the synthetic world.

The runtime analog of the reference's dataset-replay validation
(SURVEY.md §4), but deterministic and assertable.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fastliosam_tpu.core.geodesy import LocalCartesian
from fastliosam_tpu.loop import LoopConfig
from fastliosam_tpu.map import VoxelMapConfig
from fastliosam_tpu.odom import ImuBatch, OdomConfig, Scan
from fastliosam_tpu.pgo import PoseGraphConfig
from fastliosam_tpu.runtime import EngineConfig, GpsFix, SlamEngine
from fastliosam_tpu.sim import PlaneWorld, SimConfig, Trajectory, simulate_sequence

pytestmark = pytest.mark.slow

ANCHOR = (22.3193, 114.1694, 10.0)


def make_engine(use_gps=False):
    return SlamEngine(
        odom_cfg=OdomConfig(
            point_filter_num=1,
            blind=0.5,
            filter_size_surf=0.3,
            num_ds_points=2048,
            evict_every=10_000,
        ),
        map_cfg=VoxelMapConfig(capacity=1 << 16, voxel_size=0.4, min_points=4),
        loop_cfg=LoopConfig(
            radius=8.0,
            time_gap=6.0,
            num_submap_keyframes=2,
            voxel_res=0.25,
            submap_points=8192,
            max_iterations=25,
            nn_chunk=1024,
        ),
        pgo_cfg=PoseGraphConfig(
            max_keyframes=128, max_between=256, max_gps=64,
            lm_iters=8, pcg_iters=96,
        ),
        cfg=EngineConfig(
            keyframe_threshold=0.5,
            loop_check_every=4,
            kf_cloud_points=2048,
            kf_cloud_voxel=0.25,
            use_gps=use_gps,
            gps_dist_thres=2.0,
            min_traj_len=3.0,
        ),
    )


@pytest.fixture(scope="module")
def loop_run():
    """~1.3 laps of a small circle: the second pass must trigger loops."""
    world = PlaneWorld.room(size=30.0, height=6.0, n_boxes=10, seed=1)
    traj = Trajectory.circle(radius=8.0, period=16.0)
    cfg = SimConfig(
        scan_rate=5.0,
        n_azimuth=256,
        n_elev=10,
        gyro_noise=0.001,
        acc_noise=0.01,
        gyro_bias=(0, 0, 0),
        acc_bias=(0, 0, 0),
        seed=3,
    )
    n_scans = 105  # 21 s -> 1.3 laps
    data = simulate_sequence(world, traj, cfg, n_scans=n_scans)
    return data, traj


def run_engine(engine, data, traj, gps_fixes=None):
    R0, p0 = traj.pose(0.0)
    nav = engine.odom.nav._replace(
        R=jnp.asarray(R0, jnp.float32),
        p=jnp.asarray(p0, jnp.float32),
        v=jnp.asarray(traj.velocity(0.0), jnp.float32),
    )
    engine.odom = engine.odom._replace(nav=nav)
    poses = []
    gps_iter = list(gps_fixes or [])
    for k in range(len(data["scans"])):
        pts, toff, mask = data["scans"][k]
        scan = Scan(jnp.asarray(pts), jnp.asarray(toff), jnp.asarray(mask))
        ts, gy, ac = data["imu"][k]
        n = len(ts)
        cap = 64
        imu = ImuBatch(
            stamps=jnp.asarray(np.pad(ts, (0, cap - n), constant_values=1e9)),
            gyro=jnp.asarray(np.pad(gy, ((0, cap - n), (0, 0)))),
            acc=jnp.asarray(np.pad(ac, ((0, cap - n), (0, 0)))),
            mask=jnp.asarray(np.arange(cap) < n),
        )
        stamp = data["stamps"][k]
        fixes = [f for f in gps_iter if stamp - 0.2 <= f.stamp <= stamp]
        poses.append(engine.process(scan, imu, stamp, data["scan_dt"], gps=fixes))
    return np.stack(poses)


def test_full_pipeline_with_loops(loop_run):
    data, traj = loop_run
    engine = make_engine()
    poses = run_engine(engine, data, traj)
    assert engine.kf.n > 10
    assert len(engine.loop_pairs) >= 1, "no loop closures found on revisit"
    assert engine.solve_count >= 1
    # trajectory accuracy after PGO
    errs = []
    for k in range(len(data["scans"])):
        _, p_gt = data["gt"][k]
        errs.append(np.linalg.norm(poses[k][:3, 3] - p_gt))
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.3, f"full-pipeline ATE {ate}"
    # keyframe poses stay consistent after solve
    kf_poses = engine.keyframe_poses()
    assert np.all(np.isfinite(kf_poses))


def test_map_assembly_and_persistence(loop_run, tmp_path):
    data, traj = loop_run
    engine = make_engine()
    run_engine(engine, data, traj)
    engine.finish()  # resolve pending loop verifications before snapshotting
    pts = engine.assemble_map(voxel=0.4)
    assert len(pts) > 1000
    # the map must stay within the room bounds (30 m + margin)
    assert np.abs(pts).max() < 40.0

    # --- result export (saveFlagCallback parity) ---
    from fastliosam_tpu.io import read_kitti_poses, read_tum_trajectory
    from fastliosam_tpu.io.pcd import read_pcd, xyz_of
    from fastliosam_tpu.runtime import load_checkpoint, save_checkpoint, save_results

    paths = save_results(engine, str(tmp_path), "simtest", map_voxel=0.4)
    kposes = read_kitti_poses(paths["kitti"])
    assert len(kposes) == engine.kf.n
    np.testing.assert_allclose(kposes, engine.keyframe_poses(), atol=1e-5)
    stamps, tposes = read_tum_trajectory(paths["tum"])
    assert len(stamps) == engine.kf.n
    map_cloud = read_pcd(paths["map_pcd"])
    assert len(map_cloud) == len(pts)
    np.testing.assert_allclose(
        np.sort(xyz_of(map_cloud), axis=0), np.sort(pts, axis=0), atol=1e-4
    )

    # --- checkpoint/resume roundtrip ---
    ckpt = str(tmp_path / "ckpt.npz")
    save_checkpoint(engine, ckpt)
    engine2 = make_engine()
    load_checkpoint(engine2, ckpt)
    assert engine2.kf.n == engine.kf.n
    assert engine2.scan_count == engine.scan_count
    np.testing.assert_allclose(
        engine2.keyframe_poses(), engine.keyframe_poses(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(engine2.odom.nav.p), np.asarray(engine.odom.nav.p), atol=1e-6
    )
    # the resumed engine keeps processing
    pts2, toff2, mask2 = data["scans"][-1]
    scan = Scan(jnp.asarray(pts2), jnp.asarray(toff2), jnp.asarray(mask2))
    ts, gy, ac = data["imu"][-1]
    cap = 64
    n = len(ts)
    imu = ImuBatch(
        stamps=jnp.asarray(np.pad(ts, (0, cap - n), constant_values=1e9)),
        gyro=jnp.asarray(np.pad(gy, ((0, cap - n), (0, 0)))),
        acc=jnp.asarray(np.pad(ac, ((0, cap - n), (0, 0)))),
        mask=jnp.asarray(np.arange(cap) < n),
    )
    out = engine2.process(scan, imu, data["stamps"][-1] + 0.2, data["scan_dt"])
    assert np.all(np.isfinite(out))


def test_gps_fusion(loop_run):
    """GPS fixes (geodetic, via the ENU anchor) must produce gps factors and
    keep the trajectory georeferenced."""
    data, traj = loop_run
    lc = LocalCartesian.from_origin(*ANCHOR)
    fixes = []
    for (tg, xyz, noise) in data["gps"]:
        lat, lon, alt = lc.reverse(jnp.asarray(xyz, jnp.float32))
        fixes.append(
            GpsFix(
                stamp=float(tg),
                lat=float(lat),
                lon=float(lon),
                alt=float(alt),
                cov_xyz=(0.25, 0.25, 1.0),
            )
        )
    engine = make_engine(use_gps=True)
    poses = run_engine(engine, data, traj, gps_fixes=fixes)
    assert int(engine.graph.n_gps) >= 2, "no gps factors added"
    errs = [
        np.linalg.norm(poses[k][:3, 3] - data["gt"][k][1])
        for k in range(len(poses))
    ]
    assert float(np.sqrt(np.mean(np.square(errs)))) < 0.6


def _chunked_feed(data, chunk=5, cap=64):
    """Stack a sim sequence into process_chunk inputs."""
    xyz = np.stack([s[0] for s in data["scans"]])
    toff = np.stack([s[1] for s in data["scans"]])
    mask = np.stack([s[2] for s in data["scans"]])
    stamps = np.asarray(data["stamps"], np.float64)
    S = (xyz.shape[0] // chunk) * chunk
    feed = []
    for c in range(0, S, chunk):
        ks = range(c, c + chunk)
        imu_t = np.stack([
            np.pad(data["imu"][k][0], (0, cap - len(data["imu"][k][0])),
                   constant_values=1e9) for k in ks
        ])
        imu_g = np.stack([
            np.pad(data["imu"][k][1],
                   ((0, cap - len(data["imu"][k][1])), (0, 0))) for k in ks
        ])
        imu_a = np.stack([
            np.pad(data["imu"][k][2],
                   ((0, cap - len(data["imu"][k][2])), (0, 0))) for k in ks
        ])
        imu_m = np.stack([
            np.arange(cap) < len(data["imu"][k][0]) for k in ks
        ])
        sl = slice(c, c + chunk)
        feed.append((
            Scan(jnp.asarray(xyz[sl]), jnp.asarray(toff[sl]),
                 jnp.asarray(mask[sl])),
            ImuBatch(stamps=jnp.asarray(imu_t.astype(np.float32)),
                     gyro=jnp.asarray(imu_g.astype(np.float32)),
                     acc=jnp.asarray(imu_a.astype(np.float32)),
                     mask=jnp.asarray(imu_m)),
            stamps[sl],
        ))
    return feed


def test_mesh_engine_matches_single_device():
    """FULL pipeline over the 8-device mesh (VERDICT r4 #2): the engine in
    mesh mode — odometry over the slot-sharded voxel map, fused loop
    detection, point-sharded ICP verification, factor-sharded PGO solve —
    reproduces the single-device engine on a loop-closing feed. This is
    the executable end-to-end path for BASELINE config #5 (MulRan-
    Riverside over N≥2 hosts; ref pain points `loop_closure.cpp:25-38`,
    `fast_lio_sam.cpp:787-790`)."""
    from fastliosam_tpu.parallel import make_mesh

    world = PlaneWorld.room(size=24.0, height=6.0, n_boxes=8, seed=5)
    traj = Trajectory.circle(radius=5.0, period=8.0)
    sim_cfg = SimConfig(
        scan_rate=5.0, n_azimuth=256, n_elev=10,
        gyro_noise=0.001, acc_noise=0.01,
        gyro_bias=(0, 0, 0), acc_bias=(0, 0, 0), seed=7,
    )
    data = simulate_sequence(world, traj, sim_cfg, n_scans=55)  # 1.37 laps
    feed = _chunked_feed(data, chunk=5)

    def build(mesh):
        return SlamEngine(
            odom_cfg=OdomConfig(
                point_filter_num=1, blind=0.5, filter_size_surf=0.3,
                num_ds_points=1024, evict_every=10_000,
                query_mode="merged3",
            ),
            map_cfg=VoxelMapConfig(capacity=1 << 14, voxel_size=0.4,
                                   min_points=4),
            loop_cfg=LoopConfig(
                radius=6.0, time_gap=4.0, num_submap_keyframes=2,
                voxel_res=0.25, submap_points=4096, max_iterations=15,
                nn_chunk=512,
                # the sharded ICP is untrimmed and fixed-length; pin the
                # reference engine to the same semantics
                trim_fraction=1.0, convergence_eps=0.0,
            ),
            pgo_cfg=PoseGraphConfig(
                max_keyframes=64, max_between=128, max_gps=16,
                lm_iters=6, pcg_iters=64,
            ),
            cfg=EngineConfig(
                keyframe_threshold=0.5, loop_check_every=5,
                kf_cloud_points=1024, kf_cloud_voxel=0.25,
            ),
            mesh=mesh,
        )

    def run(engine):
        R0, p0 = traj.pose(0.0)
        engine.odom = engine.odom._replace(
            nav=engine.odom.nav._replace(
                R=jnp.asarray(R0, jnp.float32),
                p=jnp.asarray(p0, jnp.float32),
                v=jnp.asarray(traj.velocity(0.0), jnp.float32),
            )
        )
        for (scans, imus, stamps) in feed:
            engine.process_chunk(scans, imus, stamps, data["scan_dt"])
        engine.finish()
        return np.stack(engine.realtime_traj)

    ref = build(None)
    traj_ref = run(ref)
    sh = build(make_mesh(8))
    traj_sh = run(sh)

    assert sh.kf.n == ref.kf.n
    assert len(ref.loop_pairs) >= 1, "feed must exercise loop closure"
    assert sh.loop_pairs == ref.loop_pairs
    assert sh.solve_count == ref.solve_count
    np.testing.assert_allclose(
        traj_sh[:, :3, 3], traj_ref[:, :3, 3], rtol=0, atol=0.05
    )


def test_loop_on_second_device(loop_run):
    """Pipeline-parallel loop verification: dispatch ICP to device 1 of the
    virtual mesh; loops must still be found and the pipeline stays accurate."""
    import jax

    assert len(jax.devices()) >= 2
    data, traj = loop_run
    engine = make_engine()
    engine.cfg = engine.cfg._replace(loop_device=1)
    # rebuild the verify jit on the chosen device
    engine.__init__(
        odom_cfg=engine.odom_cfg, map_cfg=engine.map_cfg,
        loop_cfg=engine.loop_cfg, pgo_cfg=engine.pgo_cfg,
        cfg=engine.cfg,
    )
    poses = run_engine(engine, data, traj)
    engine.finish()
    assert len(engine.loop_pairs) >= 1
    errs = [
        np.linalg.norm(poses[k][:3, 3] - data["gt"][k][1])
        for k in range(len(poses))
    ]
    assert float(np.sqrt(np.mean(np.square(errs)))) < 0.35
