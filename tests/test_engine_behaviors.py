"""Unit tests for engine behaviors added for reference fidelity:

* loop processed-flag dedup (`fast_lio_sam.cpp:684-689`)
* GPS pose-covariance gate (`fast_lio_sam.cpp:192-193`)
* distance-triggered capture hook (`fast_lio_sam.cpp:389-407`)
* loud grow/error at graph capacity (no silent factor drops)

These drive the engine with tiny synthetic inputs (empty scans, CV-only
odometry) so they run in seconds, unlike the full-pipeline tests in
test_engine.py.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fastliosam_tpu.loop import LoopConfig
from fastliosam_tpu.map import VoxelMapConfig
from fastliosam_tpu.odom import ImuBatch, OdomConfig, Scan
from fastliosam_tpu.pgo import PoseGraphConfig
from fastliosam_tpu.runtime import EngineConfig, GpsFix, SlamEngine


def tiny_engine(**cfg_kw):
    pgo_kw = cfg_kw.pop("pgo_kw", {})
    return SlamEngine(
        odom_cfg=OdomConfig(
            point_filter_num=1, blind=0.1, filter_size_surf=0.3,
            num_ds_points=64, evict_every=10_000,
        ),
        map_cfg=VoxelMapConfig(capacity=1 << 10, voxel_size=0.4, min_points=4),
        loop_cfg=LoopConfig(
            radius=5.0, time_gap=2.0, num_submap_keyframes=1,
            submap_points=256, max_iterations=4, nn_chunk=64,
        ),
        pgo_cfg=PoseGraphConfig(
            max_keyframes=4, max_between=4, max_gps=2, lm_iters=2,
            pcg_iters=8, **pgo_kw,
        ),
        cfg=EngineConfig(
            keyframe_threshold=0.15, loop_check_every=2,
            kf_cloud_points=64, kf_cloud_voxel=0.3, **cfg_kw,
        ),
    )


def empty_scan(n=64):
    return Scan(
        xyz=jnp.zeros((n, 3), jnp.float32),
        t_offset=jnp.zeros((n,), jnp.float32),
        mask=jnp.zeros((n,), bool),
    )


def empty_imu(m=8):
    return ImuBatch(
        stamps=jnp.full((m,), 1e9, jnp.float32),
        gyro=jnp.zeros((m, 3), jnp.float32),
        acc=jnp.zeros((m, 3), jnp.float32),
        mask=jnp.zeros((m,), bool),
    )


def drive(engine, n_scans, v=1.0, dt=0.1, **process_kw):
    """CV-only rollout: no IMU, empty scans — the filter's constant-velocity
    prediction moves it v*dt per scan, exercising keyframing/hook/capacity
    paths without real matching."""
    engine.odom = engine.odom._replace(
        nav=engine.odom.nav._replace(v=jnp.asarray([v, 0.0, 0.0], jnp.float32))
    )
    out = []
    for k in range(n_scans):
        out.append(
            engine.process(empty_scan(), empty_imu(), k * dt, dt, **process_kw)
        )
    return out


def test_capture_hook_distance_trigger():
    engine = tiny_engine(capture_distance=0.25)
    calls = []
    engine.capture_hook = lambda stamp, T: calls.append((stamp, T.copy()))
    drive(engine, 12)  # ~1.1 m traveled at 1 m/s, 0.1 s steps
    assert 3 <= len(calls) <= 5, f"expected ~4 captures, got {len(calls)}"
    # monotone stamps, ~0.25 m apart
    pos = np.array([T[:3, 3] for _, T in calls])
    gaps = np.linalg.norm(np.diff(pos, axis=0), axis=1)
    assert np.all(gaps > 0.2)


def test_capture_hook_disabled_by_default():
    engine = tiny_engine()
    calls = []
    engine.capture_hook = lambda stamp, T: calls.append(stamp)
    drive(engine, 6)
    assert calls == []


def test_capacity_grow_keyframes_and_betweens():
    engine = tiny_engine()
    with pytest.warns(UserWarning, match="capacity"):
        drive(engine, 14)  # ~7 keyframes at 0.15 m threshold > cap 4
    assert engine.kf.n > 4
    assert engine.pgo_cfg.max_keyframes >= 8
    assert engine.graph.poses.shape[0] == engine.pgo_cfg.max_keyframes
    assert int(engine.graph.n_kf) == engine.kf.n
    # odometry chain intact across the grow: k-1 between factors
    assert int(engine.graph.n_bt) == engine.kf.n - 1
    assert bool(jnp.all(engine.graph.bt_valid[: engine.kf.n - 1]))
    # poses preserved: translations strictly increasing in x
    x = np.asarray(engine.graph.poses[: engine.kf.n, 0, 3])
    assert np.all(np.diff(x) > 0)


def test_capacity_error_policy():
    engine = tiny_engine(capacity_policy="error")
    with pytest.raises(RuntimeError, match="capacity"):
        drive(engine, 20)


def test_loop_processed_dedup():
    engine = tiny_engine()
    detect_calls = []
    orig = engine._jit_detect
    engine._jit_detect = lambda *a: (detect_calls.append(1), orig(*a))[1]
    drive(engine, 8)
    n1 = len(detect_calls)
    assert n1 >= 1
    # vehicle dwells: no new keyframes -> the same latest keyframe must NOT
    # be re-queried (processed flag, fast_lio_sam.cpp:684-689)
    engine.odom = engine.odom._replace(
        nav=engine.odom.nav._replace(v=jnp.zeros((3,), jnp.float32))
    )
    for k in range(8):
        engine.process(empty_scan(), empty_imu(), 0.8 + k * 0.1, 0.1)
    assert len(detect_calls) == n1, "dwelling re-queried a processed keyframe"


def test_gps_pose_cov_gate():
    engine = tiny_engine(
        use_gps=True, min_traj_len=0.0, gps_dist_thres=0.0,
        gps_time_tol=10.0, pose_cov_thres=0.02,
    )
    engine.traj_len = 10.0

    def push_fix(x):
        engine.gps_queue.append(
            (0.0, np.array([x, 0.0, 0.0]), np.array([0.5, 0.5, 0.5]))
        )

    # never solved -> covariance unknown/unbounded -> gate open
    push_fix(10.0)
    engine._try_add_gps_factor(0, 0.0, np.eye(4, dtype=np.float32))
    assert engine._n_gps_host == 1

    # well-constrained pose right at the last solve -> gated
    engine._cov6 = np.diag([1e-4] * 3 + [1e-6] * 3)
    engine._cov_solved_kf = 1
    engine._cov_solved_p = np.zeros(2)
    engine._cov_solved_trajlen = engine.traj_len
    push_fix(20.0)
    engine._try_add_gps_factor(1, 0.0, np.eye(4, dtype=np.float32))
    assert engine._n_gps_host == 1, "GPS factor added despite small pose cov"

    # covariance estimate must grow between solves (dead-reckoning
    # extrapolation: translation walk + yaw lever) and re-open the gate
    engine.traj_len = engine._cov_solved_trajlen + 9.0
    grown = engine._pose_cov_estimate(10, np.array([9.0, 0.0, 0.0]))
    assert np.all(grown > np.array([1e-4, 1e-4]))
    push_fix(30.0)
    engine._try_add_gps_factor(10, 0.0, np.eye(4, dtype=np.float32))
    assert engine._n_gps_host == 2


def test_gps_factor_capacity_grow():
    engine = tiny_engine(
        use_gps=True, min_traj_len=0.0, gps_dist_thres=0.0, gps_time_tol=10.0
    )
    engine.traj_len = 10.0
    with pytest.warns(UserWarning, match="GPS-factor capacity"):
        for i in range(4):  # cap is 2
            engine.gps_queue.append(
                (0.0, np.array([10.0 * (i + 1), 0.0, 0.0]),
                 np.array([0.5, 0.5, 0.5]))
            )
            engine._try_add_gps_factor(0, 0.0, np.eye(4, dtype=np.float32))
    assert engine._n_gps_host == 4
    assert int(engine.graph.n_gps) == 4
    assert engine.pgo_cfg.max_gps >= 4


def chunked_drive(engine, n_scans, chunk=4, v=1.0, dt=0.1):
    engine.odom = engine.odom._replace(
        nav=engine.odom.nav._replace(v=jnp.asarray([v, 0.0, 0.0], jnp.float32))
    )
    out = []
    for c in range(0, n_scans, chunk):
        S = min(chunk, n_scans - c)
        scans = Scan(
            xyz=jnp.zeros((S, 64, 3), jnp.float32),
            t_offset=jnp.zeros((S, 64), jnp.float32),
            mask=jnp.zeros((S, 64), bool),
        )
        imus = ImuBatch(
            stamps=jnp.full((S, 8), 1e9, jnp.float32),
            gyro=jnp.zeros((S, 8, 3), jnp.float32),
            acc=jnp.zeros((S, 8, 3), jnp.float32),
            mask=jnp.zeros((S, 8), bool),
        )
        stamps = [(c + i) * dt for i in range(S)]
        out.append(engine.process_chunk(scans, imus, stamps, dt))
    return np.concatenate(out, axis=0)


def test_chunked_matches_per_scan():
    """process_chunk (on-device keyframe decision, one sync per chunk) must
    reproduce the per-scan process() path: same poses, keyframes, factors."""
    e1 = tiny_engine()
    per_scan = np.stack(drive(e1, 12))
    e2 = tiny_engine()
    chunked = chunked_drive(e2, 12, chunk=4)
    np.testing.assert_allclose(chunked, per_scan, atol=1e-5)
    assert e2.kf.n == e1.kf.n
    assert int(e2.graph.n_bt) == int(e1.graph.n_bt)
    assert e2._n_bt_host == e1._n_bt_host
    np.testing.assert_allclose(
        np.asarray(e2.graph.poses[: e2.kf.n]),
        np.asarray(e1.graph.poses[: e1.kf.n]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(e2.kf.stamps[: e2.kf.n]),
        np.asarray(e1.kf.stamps[: e1.kf.n]),
        atol=1e-6,
    )
    assert e2.traj_len == pytest.approx(e1.traj_len, abs=1e-4)


def test_chunked_capture_hook_and_growth():
    engine = tiny_engine(capture_distance=0.25)
    calls = []
    engine.capture_hook = lambda stamp, T: calls.append(stamp)
    with pytest.warns(UserWarning, match="capacity"):
        chunked_drive(engine, 16, chunk=4)
    assert engine.kf.n > 4  # grew past the cap of 4
    assert 4 <= len(calls) <= 7


def test_checkpoint_restores_counters(tmp_path):
    """Resume restores capacity counters / dedup watermark / grown caps —
    a resumed run must keep enforcing no-silent-drop semantics."""
    from fastliosam_tpu.runtime import load_checkpoint, save_checkpoint

    e1 = tiny_engine()
    with pytest.warns(UserWarning, match="capacity"):
        drive(e1, 14)  # grows past the cap of 4
    p = str(tmp_path / "ck.npz")
    save_checkpoint(e1, p)
    e2 = tiny_engine()
    load_checkpoint(e2, p)
    assert e2._n_bt_host == e1._n_bt_host == int(e1.graph.n_bt)
    assert e2._loop_processed_kf == e2.kf.n - 1
    assert e2.pgo_cfg.max_keyframes == e1.pgo_cfg.max_keyframes
    # resumed engine keeps processing + growing without silent drops
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        drive(e2, 10)
    assert int(e2.graph.n_bt) == e2._n_bt_host == e2.kf.n - 1


def test_deferred_chunked_matches_sync():
    """process_chunk_deferred (one-chunk-deep pipelined readback) must
    reproduce the synchronous chunked path on a loop-free feed: same
    realtime poses, keyframes, factors, trajectory length. The deferred
    path is the production reader's overlap mechanism
    (`runtime/drivers.py`)."""
    e1 = tiny_engine()
    sync = chunked_drive(e1, 12, chunk=4)

    e2 = tiny_engine()
    e2.odom = e2.odom._replace(
        nav=e2.odom.nav._replace(v=jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    )
    out = []
    for c in range(0, 12, 4):
        scans = Scan(
            xyz=jnp.zeros((4, 64, 3), jnp.float32),
            t_offset=jnp.zeros((4, 64), jnp.float32),
            mask=jnp.zeros((4, 64), bool),
        )
        imus = ImuBatch(
            stamps=jnp.full((4, 8), 1e9, jnp.float32),
            gyro=jnp.zeros((4, 8, 3), jnp.float32),
            acc=jnp.zeros((4, 8, 3), jnp.float32),
            mask=jnp.zeros((4, 8), bool),
        )
        stamps = [(c + i) * 0.1 for i in range(4)]
        r = e2.process_chunk_deferred(scans, imus, stamps, 0.1)
        if r is not None:
            out.append(r)
    e2.finish()  # resolves the final in-flight chunk
    assert len(e2.realtime_traj) == 12
    deferred = np.stack(e2.realtime_traj)
    np.testing.assert_allclose(deferred, np.stack(e1.realtime_traj), atol=1e-5)
    np.testing.assert_allclose(np.concatenate(out + [deferred[-4:]], axis=0)[:12],
                               sync, atol=1e-5)
    assert e2.kf.n == e1.kf.n
    assert e2._n_bt_host == e1._n_bt_host
    assert e2.traj_len == pytest.approx(e1.traj_len, abs=1e-4)


def test_gps_anchor_warmup_averages_offset():
    """The ENU anchor offset is averaged over gps_anchor_warmup fixes (the
    reference anchors at the FIRST fix, making its noise a coherent bias on
    every measurement — EngineConfig.gps_anchor_warmup doc). Noisy fixes
    around a known trajectory must yield an offset close to the noise-free
    value, and the buffered fixes must flush into the fusion queue."""
    import numpy as np

    from fastliosam_tpu.runtime import GpsFix
    from fastliosam_tpu.core.geodesy import LocalCartesian

    engine = tiny_engine(use_gps=True, gps_anchor_warmup=8)
    # fabricate a driven trajectory: realtime poses along +x at 1 m/s
    rng = np.random.default_rng(0)
    anchor = (22.3193, 114.1694, 10.0)
    lc = LocalCartesian.from_origin(*anchor)
    true_world = lambda t: np.array([5.0 + t, 2.0, 0.0])  # noqa: E731
    for k in range(12):
        t = 0.1 * k
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = true_world(t)
        engine.realtime_traj.append(T)
        engine.scan_stamps.append(t)
    import jax.numpy as jnp

    for k in range(10):
        t = 0.1 * k
        noisy = true_world(t) + rng.normal(size=3) * 0.3
        lat, lon, alt = lc.reverse(jnp.asarray(noisy, jnp.float32))
        engine._on_gps(GpsFix(stamp=t, lat=float(lat), lon=float(lon),
                              alt=float(alt), cov_xyz=(0.09, 0.09, 0.09)))
    assert engine._gps_warmup is None, "warmup should have finalized"
    assert len(engine.gps_queue) == 10  # buffered fixes flushed
    # offset recovers SLAM-vs-ENU displacement to ~noise/sqrt(8)
    # (fix 0's raw ENU is the anchor origin, so offset ~ true_world(0))
    est_world = [q[1] for q in engine.gps_queue]
    errs = [np.linalg.norm(est_world[k][:2] - true_world(0.1 * k)[:2])
            for k in range(10)]
    # individual fixes keep their own noise, but the COHERENT part
    # (anchor bias) is averaged out: mean error component is small
    mean_err = np.linalg.norm(
        np.mean([est_world[k] - true_world(0.1 * k) for k in range(10)],
                axis=0)[:2]
    )
    assert mean_err < 0.2, mean_err
    assert max(errs) < 2.0, errs  # individual fixes keep ~0.4 m noise + tails


def test_gps_warmup_force_finalizes_on_finish():
    """Sparse GPS: fewer fixes than the warmup quota must NOT be silently
    discarded — finish() force-finalizes the anchor with whatever fixes
    matched and retro-attaches factors to the corresponding keyframes
    (advisor r4: _gps_warmup never finalized on short sequences and every
    buffered fix was dropped)."""
    from fastliosam_tpu.core.geodesy import LocalCartesian
    from fastliosam_tpu.runtime import GpsFix

    engine = tiny_engine(use_gps=True, gps_anchor_warmup=8,
                         min_traj_len=0.1, gps_dist_thres=0.1)
    anchor = (22.3193, 114.1694, 10.0)
    lc = LocalCartesian.from_origin(*anchor)
    # only 3 fixes ever arrive (< warmup 8), at scan stamps
    drive(engine, 12)
    for k in range(3):
        t = 0.1 * k
        lat, lon, alt = lc.reverse(jnp.asarray([t, 0.0, 0.0], jnp.float32))
        engine._on_gps(GpsFix(stamp=t, lat=float(lat), lon=float(lon),
                              alt=float(alt), cov_xyz=(0.09, 0.09, 0.09)))
    assert engine._gps_warmup is not None  # quota never reached mid-run
    engine.finish()
    assert engine._gps_warmup is None, "finish() must finalize the anchor"
    assert int(engine.graph.n_gps) >= 1, "flushed fixes must become factors"


def test_gps_motion_compensation():
    """A fix whose stamp precedes the keyframe stamp must be propagated to
    the keyframe time by the local velocity (EngineConfig.gps_motion_comp):
    at 2 m/s along +x a fix 0.04 s early constrains a point 0.08 m behind
    the keyframe — uncompensated, that motion becomes factor error."""
    engine = tiny_engine(
        use_gps=True, min_traj_len=0.0, gps_dist_thres=0.0,
        gps_time_tol=0.05,
    )
    engine.traj_len = 10.0
    # synthesize a corrected realtime trajectory at 2 m/s along +x
    v, dt = 2.0, 0.1
    for k in range(8):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = v * k * dt
        engine.realtime_traj.append(T)
        engine.scan_stamps.append(k * dt)
    kf_stamp = 0.5
    fix_stamp = kf_stamp - 0.04
    engine.gps_queue.append(
        (fix_stamp, np.array([v * fix_stamp, 0.0, 0.0]),
         np.array([0.5, 0.5, 0.5]))
    )
    engine._try_add_gps_factor(0, kf_stamp, np.eye(4, dtype=np.float32))
    assert engine._n_gps_host == 1
    z = np.asarray(engine.graph.gps_xyz[0])
    np.testing.assert_allclose(z[0], v * kf_stamp, atol=1e-5)

    # reference-exact mode must NOT compensate
    engine2 = tiny_engine(
        use_gps=True, min_traj_len=0.0, gps_dist_thres=0.0,
        gps_time_tol=0.05, gps_motion_comp=False,
    )
    engine2.traj_len = 10.0
    engine2.realtime_traj = list(engine.realtime_traj)
    engine2.scan_stamps = list(engine.scan_stamps)
    engine2.gps_queue.append(
        (fix_stamp, np.array([v * fix_stamp, 0.0, 0.0]),
         np.array([0.5, 0.5, 0.5]))
    )
    engine2._try_add_gps_factor(0, kf_stamp, np.eye(4, dtype=np.float32))
    z2 = np.asarray(engine2.graph.gps_xyz[0])
    np.testing.assert_allclose(z2[0], v * fix_stamp, atol=1e-5)


def test_reference_exact_constructors():
    """reference_exact() must restore every documented divergence to the
    spec values (PARITY.md divergence audit, VERDICT r4 #5)."""
    lc = LoopConfig.reference_exact()
    assert lc.radius == 35.0 and lc.time_gap == 30.0  # config.yaml:11-12
    assert lc.icp_score_threshold == 1.5  # config.yaml:16
    assert lc.max_corr_factor == 1.5  # fast_lio_sam.cpp:73
    assert lc.trim_fraction == 1.0 and lc.min_correspondences == 0
    assert not lc.aniso_noise and lc.degen_move_limit == 0.0
    assert lc.icp_method == "point"
    ec = EngineConfig.reference_exact()
    assert ec.keyframe_threshold == 0.0  # config.yaml:7
    assert ec.gps_anchor_warmup == 1  # first-fix anchoring
    assert ec.gps_noise_floor == 1.0  # fast_lio_sam.cpp:252
    assert ec.gps_dist_thres == 5.0  # config.yaml:29
    assert not ec.gps_motion_comp  # fix attached as-is (cpp:198-209)
    assert ec.solve_per_keyframe  # fast_lio_sam.cpp:494-513
    # reference factor noise: Variances rad2=1e-4, m2=1e-2 -> sqrt info
    assert ec.odom_trans_sqrt_info == 10.0
    assert ec.odom_rot_sqrt_info == 100.0
    # overrides pass through
    assert EngineConfig.reference_exact(loop_check_every=7).loop_check_every == 7
    # PGO robust options default to reference-exact L2
    assert PoseGraphConfig().gps_huber_delta == 0.0
    assert PoseGraphConfig().loop_huber_delta == 0.0


def test_deferred_depth2_matches_sync():
    """defer_depth=2 (two chunks in flight) still reproduces the
    synchronous path on a loop-free feed."""
    e1 = tiny_engine()
    sync = chunked_drive(e1, 16, chunk=4)

    e2 = tiny_engine(defer_depth=2)
    e2.odom = e2.odom._replace(
        nav=e2.odom.nav._replace(v=jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    )
    for c in range(0, 16, 4):
        scans = Scan(
            xyz=jnp.zeros((4, 64, 3), jnp.float32),
            t_offset=jnp.zeros((4, 64), jnp.float32),
            mask=jnp.zeros((4, 64), bool),
        )
        imus = ImuBatch(
            stamps=jnp.full((4, 8), 1e9, jnp.float32),
            gyro=jnp.zeros((4, 8, 3), jnp.float32),
            acc=jnp.zeros((4, 8, 3), jnp.float32),
            mask=jnp.zeros((4, 8), bool),
        )
        e2.process_chunk_deferred(
            scans, imus, [(c + i) * 0.1 for i in range(4)], 0.1
        )
    e2.finish()
    assert len(e2.realtime_traj) == 16
    np.testing.assert_allclose(
        np.stack(e2.realtime_traj), sync, atol=1e-5
    )
    assert e2.kf.n == e1.kf.n
    assert e2._n_bt_host == e1._n_bt_host
