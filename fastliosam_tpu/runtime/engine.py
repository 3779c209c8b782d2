"""The SLAM engine: deterministic dataset-driven orchestration.

Replaces the reference's ROS wiring (`FastLioSam` node, SURVEY.md §1 L2 +
§3.1-3.3): no callbacks/timers/mutexes — a single `process()` call per scan
advances odometry (jitted, device-resident state), decides keyframes,
assembles factors (odometry between-factors, GPS unary factors with the
reference's gating rules), runs loop detection + ICP verification at a
fixed cadence, and re-solves the pose graph. Realtime pose output uses the
reference's delta-chaining (`fast_lio_sam.cpp:374-384`):

    corrected(t) = last_corrected_kf · (raw_kf⁻¹ · raw(t))

Device state (filter, voxel map, keyframe SoA, factor graph) stays on the
accelerator; the host only reads back small scalars (keyframe decision,
loop accept flags) at keyframe cadence.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core import se3
from ..core.geodesy import LocalCartesian
from ..core.pointcloud import Cloud, voxel_downsample
from ..loop import LoopConfig, fetch_closest_keyframe_idx, verify_loop
from ..map import VoxelMapConfig
from ..odom import ImuBatch, OdomConfig, Scan, init_odom, odom_step
from ..pgo import (
    PoseGraph,
    PoseGraphConfig,
    add_between,
    add_gps,
    add_keyframe,
    grow,
    make_graph,
    marginal_covariance,
    solve,
)


class EngineConfig(NamedTuple):
    """PGO-node parameter surface (reference `config.yaml` + defaults at
    `fast_lio_sam.cpp:64-98`)."""

    keyframe_threshold: float = 1.0  # config.yaml:7 (m between keyframes)
    loop_check_every: int = 5  # scans between loop attempts (2 Hz @ 10 Hz)
    kf_cloud_points: int = 4096  # stored per-keyframe cloud budget
    kf_cloud_voxel: float = 0.3
    # GPS gating (config.yaml:26-30, fast_lio_sam.cpp:177-260)
    use_gps: bool = False
    gps_cov_thres: float = 2.0
    gps_dist_thres: float = 5.0
    min_traj_len: float = 5.0
    use_gps_elevation: bool = False
    gps_time_tol: float = 0.05
    gps_noise_floor: float = 1.0
    # ENU-anchor warmup: average the (SLAM position − raw ENU) offset over
    # this many fixes before fusing any. The reference resets its
    # LocalCartesian at the FIRST fix (fast_lio_sam.cpp:156-159), so that
    # one fix's noise becomes a coherent bias on EVERY subsequent GPS
    # measurement — measured 0.5-1.0 m of the gps_degraded ATE, and a
    # stiff odometry chain cannot resist a coherent pull (only the prior
    # anchors absolute position). 1 = reference-exact.
    gps_anchor_warmup: int = 10
    # skip GPS factors while the pose marginal covariance (x/y translation)
    # is already below this (fast_lio_sam.cpp:192-193, pose_cov_thres 0.02)
    pose_cov_thres: float = 0.02
    # DELIBERATE DIVERGENCE — GPS fix motion compensation: the reference
    # attaches the nearest-stamp fix as-is (queue scrub ±0.05 s,
    # fast_lio_sam.cpp:198-209), so at 8 m/s up to 0.4 m of vehicle motion
    # between fix time and keyframe time is folded straight into the
    # factor. The fix measured p(t_fix); the factor constrains
    # p(t_kf) ≈ p(t_fix) + v·(t_kf − t_fix) with v finite-differenced
    # from the corrected realtime trajectory. False = reference-exact.
    gps_motion_comp: bool = True
    # distance-triggered capture hook cadence in meters: the reference calls
    # the /save_image service every >=1 m traveled (fast_lio_sam.cpp:389-407).
    # 0 disables; assign `engine.capture_hook = fn(stamp, corrected_T)`.
    capture_distance: float = 0.0
    # what to do when a fixed-capacity graph/keyframe array fills up:
    # "grow" doubles the capacity (recompiles the solver at the new shape),
    # "error" raises. Never drops silently.
    capacity_policy: str = "grow"
    # odometry between-factor noise (fast_lio_sam.cpp:471-474:
    # Variances rad²=1e-4, m²=1e-2 -> sqrt info [10, 100])
    odom_trans_sqrt_info: float = 10.0
    odom_rot_sqrt_info: float = 100.0
    # pipeline parallelism: device ordinal for loop verification (the
    # reference's 2 Hz loop timer runs beside the odometry callback; with
    # >1 device the ICP verification dispatches to another chip and JAX's
    # async dispatch overlaps it with odometry). None = same device.
    loop_device: int | None = None
    # deferred-chunk pipeline depth: how many chunks may be in flight
    # before their readback is resolved (process_chunk_deferred). Depth 1
    # hides one chunk's readback + chunk-tail work behind the next chunk's
    # execution; depth 2 additionally hides upload/dispatch latency on
    # high-RTT device links (the remote relay). Loop/solve decisions lag
    # `defer_depth` chunks (reference analog: its 2 Hz loop thread lands
    # factors with arbitrary lag, fast_lio_sam.cpp:137).
    defer_depth: int = 1
    # solve cadence: False (default) re-solves only on loop/GPS events —
    # without new loop/GPS factors the graph optimum is the odometry chain
    # itself, so extra solves are no-ops numerically. True reproduces the
    # reference spec's per-keyframe iSAM2 update (fast_lio_sam.cpp:494-513)
    # for the cadence-fidelity measurement (VERDICT r2 #7).
    solve_per_keyframe: bool = False

    @classmethod
    def reference_exact(cls, **overrides):
        """Every documented engine-level divergence restored to the
        reference spec (PARITY.md 'Divergence audit'): first-fix ENU
        anchoring (`fast_lio_sam.cpp:156-159`), the 1.0 m GPS noise floor
        (`:252`), 5 m GPS factor spacing (`config.yaml:29`), per-keyframe
        iSAM2-cadence solves (`fast_lio_sam.cpp:494-513`), and the
        keyframe threshold 0 of the shipped `config.yaml:7` (every moving
        frame a keyframe). Pair with ``LoopConfig.reference_exact()`` and
        a ``PoseGraphConfig`` with both Huber deltas 0 (the defaults)."""
        base = dict(
            keyframe_threshold=0.0, gps_anchor_warmup=1,
            gps_noise_floor=1.0, gps_dist_thres=5.0,
            solve_per_keyframe=True, gps_motion_comp=False,
        )
        base.update(overrides)
        return cls(**base)


class GpsFix(NamedTuple):
    stamp: float
    lat: float
    lon: float
    alt: float
    cov_xyz: tuple  # (var_x, var_y, var_z)
    status: int = 0


@dataclass
class KeyframeStore:
    """Fixed-capacity keyframe SoA (PosePcd analog, `pose_pcd.hpp:7-43`):
    clouds stored in body frame, raw + corrected poses, stamps."""

    clouds: jnp.ndarray  # (K, P, 3)
    masks: jnp.ndarray  # (K, P)
    raw_poses: jnp.ndarray  # (K, 4, 4) odometry frame
    stamps: jnp.ndarray  # (K,)
    n: int = 0

    @staticmethod
    def create(max_kf: int, points: int) -> "KeyframeStore":
        return KeyframeStore(
            clouds=jnp.zeros((max_kf, points, 3), jnp.float32),
            masks=jnp.zeros((max_kf, points), bool),
            raw_poses=jnp.broadcast_to(
                jnp.eye(4, dtype=jnp.float32), (max_kf, 4, 4)
            ),
            stamps=jnp.zeros((max_kf,), jnp.float32),
        )


def _downsample_to_budget(xyz, mask, voxel, budget):
    ds = voxel_downsample(Cloud(xyz=xyz, mask=mask), voxel)  # packed output
    return ds.xyz[:budget], ds.mask[:budget]


class SlamEngine:
    """Full pipeline: odometry + keyframing + loop closure + PGO + GPS."""

    def __init__(
        self,
        odom_cfg: OdomConfig = OdomConfig(),
        map_cfg: VoxelMapConfig = VoxelMapConfig(),
        loop_cfg: LoopConfig = LoopConfig(),
        pgo_cfg: PoseGraphConfig = PoseGraphConfig(),
        cfg: EngineConfig = EngineConfig(),
        map_ops=None,
        mesh=None,
        shard_axis: str = "kf",
    ):
        """``mesh`` switches the WHOLE pipeline to multi-device execution
        (the MulRan-Riverside N≥2-host configuration, BASELINE.md #5):
        the voxel-surfel map lives slot-sharded across the mesh
        (`parallel/sharded_odom.sharded_map_ops` — query/insert/evict with
        psum-fused collectives), the PGO solve shards its factor arrays
        (`parallel/sharded_pgo.solve_sharded`), and loop-ICP verification
        shards the source point axis (`parallel/sharded_loop.
        icp_align_sharded`; untrimmed — PCL-exact semantics, so mesh mode
        pins `trim_fraction` to 1.0). Keyframe poses/stamps stay
        replicated (6K floats ≪ everything else). ``map_ops`` alone plugs
        in just a custom map backend. Reference scaling pain points this
        addresses: `loop_closure.cpp:25-38`, `fast_lio_sam.cpp:787-790`.
        """
        self.odom_cfg = odom_cfg
        self.map_cfg = map_cfg
        self.loop_cfg = loop_cfg
        self.pgo_cfg = pgo_cfg
        self.cfg = cfg
        self.mesh = mesh
        self.shard_axis = shard_axis
        if map_ops is None and mesh is not None:
            from ..parallel.sharded_odom import sharded_map_ops

            map_ops = sharded_map_ops(mesh, shard_axis)
        self.map_ops = map_ops
        if mesh is not None and loop_cfg.trim_fraction != 1.0:
            # the point-sharded ICP is untrimmed (a global trim needs a
            # distributed k-th order statistic); run PCL-exact semantics
            self.loop_cfg = loop_cfg._replace(trim_fraction=1.0)

        # keyframe clouds come from the downsampled odometry cloud, so their
        # budget can never exceed the odometry point budget
        self.kf_points = min(cfg.kf_cloud_points, odom_cfg.num_ds_points)
        self.reset()
        self._build_programs()

    def reset(self):
        """Reset all mutable pipeline state to a fresh run while keeping the
        compiled (jitted) programs — lets a benchmark or a multi-sequence
        driver reuse compilations across runs."""
        self.odom = init_odom(self.map_cfg, self.odom_cfg)
        if getattr(self, "mesh", None) is not None:
            from ..parallel.sharded_odom import shard_map_arrays

            self.odom = self.odom._replace(
                vmap=shard_map_arrays(
                    self.odom.vmap, self.mesh, self.shard_axis
                )
            )
        self.graph: PoseGraph = make_graph(self.pgo_cfg)
        self.kf = KeyframeStore.create(self.pgo_cfg.max_keyframes, self.kf_points)
        self.last_kf_raw = np.eye(4, dtype=np.float32)
        self.last_kf_corrected = np.eye(4, dtype=np.float32)
        self.scan_count = 0
        self.loop_pairs: list[tuple[int, int]] = []
        # accepted loop measurements (4,4 numpy rels) + fitness, parallel
        # to loop_pairs — diagnostics for per-loop transform-error audits
        self.loop_rels: list[np.ndarray] = []
        self.loop_fitness: list[float] = []
        # EVERY verification attempt: (query, cand, fitness, accepted) —
        # the rejected ones are what acceptance-threshold audits need
        self.loop_attempts: list[tuple] = []
        self.raw_traj: list[np.ndarray] = []  # per-scan raw odometry poses
        self.realtime_traj: list[np.ndarray] = []  # per-scan corrected poses
        self.scan_stamps: list[float] = []
        self.traj_len = 0.0
        self._last_p = None
        # GPS state (gpsCallback analog)
        self.gps_anchor: Optional[LocalCartesian] = None
        # warmup buffer of (stamp, raw_enu, noise) fixes awaiting the
        # averaged anchor offset (None once finalized)
        self._gps_warmup: Optional[list] = []
        # SLAM-frame position of the vehicle when the ENU anchor was set:
        # gps_in_slam = enu + offset. (The reference assumes the SLAM origin
        # coincides with the first fix; this generalizes that.)
        self.gps_slam_offset = np.zeros(3)
        self.gps_queue: list[tuple[float, np.ndarray, np.ndarray]] = []
        self.last_gps_factor_pos: Optional[np.ndarray] = None
        self.solve_count = 0
        self._needs_solve = False
        # pose marginal covariance (full 6×6 [trans, rot] block) of the last
        # keyframe at the most recent solve; None = never solved (treated as
        # unbounded, so the GPS gate stays open). Between solves the x/y
        # variances are extrapolated by first-order dead reckoning
        # (`pgo.extrapolate_pose_cov`), which needs the position + path
        # length at the solve.
        self._cov6: Optional[np.ndarray] = None
        self._cov_solved_kf = -1
        self._cov_solved_p = np.zeros(2)
        self._cov_solved_trajlen = 0.0
        # loop dedup: highest keyframe index already loop-attempted (the
        # reference's per-keyframe processed_ flag, fast_lio_sam.cpp:684-689)
        self._loop_processed_kf = 0
        # in-flight (async) loop verifications, FIFO
        self._pending_loops: list = []
        # in-flight chunk handles for the deferred (pipelined) chunk path
        self._pending_chunks: list = []
        # host-side factor counters (adds happen inside jit, so overflow
        # there would be silent — the engine enforces capacity up front)
        self._n_bt_host = 0
        self._n_gps_host = 0
        # distance-triggered capture hook (fast_lio_sam.cpp:389-407)
        self.capture_hook = None
        self._dist_since_capture = 0.0
        # chunked-path device residents: the on-device keyframe counter from
        # the last chunk (None = take it from the host counter) and a cache
        # of device scan_dt scalars (avoids a host->device upload per chunk)
        self._kf_n_dev = None
        self._dt_cache: dict = {}

    def _build_programs(self):
        """Create the jitted programs (once, at construction)."""
        cfg = self.cfg
        self._jit_odom = jax.jit(
            lambda s, scan, imu, dt: odom_step(
                s, scan, imu, dt, self.odom_cfg, self.map_cfg,
                map_ops=self.map_ops,
            ),
            donate_argnums=(0,),
        )
        if self.mesh is not None:
            from ..parallel.sharded_pgo import solve_sharded

            self._jit_solve = jax.jit(
                lambda g: solve_sharded(
                    g, self.pgo_cfg, self.mesh, self.shard_axis
                )
            )
        else:
            self._jit_solve = jax.jit(lambda g: solve(g, self.pgo_cfg))
        # world-frame marginal: the raw 6×6 lives in the keyframe's local
        # tangent frame; the GPS-gate extrapolation levers it against a
        # world-frame displacement, so conjugate by the keyframe rotation
        # before readback (pgo.rotate_cov_to_world)
        from ..pgo import rotate_cov_to_world

        self._jit_marginal = jax.jit(
            lambda g, i: (
                rotate_cov_to_world(
                    marginal_covariance(g, self.pgo_cfg, i),
                    se3.rot(g.poses[i]),
                ),
                se3.trans(g.poses[i]),
            )
        )
        self._jit_detect = jax.jit(
            lambda pos, stamps, valid, q: fetch_closest_keyframe_idx(
                pos, stamps, valid, q, self.loop_cfg.radius, self.loop_cfg.time_gap
            )
        )
        verify_device = (
            jax.devices()[cfg.loop_device]
            if self.mesh is None
            and cfg.loop_device is not None
            and cfg.loop_device < len(jax.devices())
            else None
        )
        self._verify_device = verify_device
        icp_fn = None
        if self.mesh is not None:
            from ..parallel.sharded_loop import icp_align_sharded

            lc = self.loop_cfg
            icp_fn = lambda s, sm, d, dm: icp_align_sharded(  # noqa: E731
                s, sm, d, dm, self.mesh, self.shard_axis,
                max_iterations=lc.max_iterations,
                max_corr_dist=lc.radius * lc.max_corr_factor,
                nn_chunk=lc.nn_chunk,
            )
        self._jit_verify = jax.jit(
            lambda cl, mk, poses, valid, qi, ci: verify_loop(
                cl, mk, poses, valid, qi, ci, self.loop_cfg, icp_fn=icp_fn
            ),
            device=verify_device,
        )
        from ..utils.precision import geometry_precision

        @geometry_precision
        def _commit_keyframe(
            graph, kf_clouds, kf_masks, kf_raw_poses, kf_stamps,
            k, cloud_world, cloud_mask, raw_T, corrected_T, prev_raw_T, stamp,
        ):
            """One dispatch per keyframe: store the body-frame downsampled
            cloud + poses/stamps and append graph entries (eager per-field
            updates would each cost a host<->device round trip)."""
            body = se3.apply_inverse(raw_T, cloud_world[None])[0]
            cl, mk = _downsample_to_budget(
                body, cloud_mask, cfg.kf_cloud_voxel, self.kf_points
            )
            kf_clouds = kf_clouds.at[k].set(cl)
            kf_masks = kf_masks.at[k].set(mk)
            kf_raw_poses = kf_raw_poses.at[k].set(raw_T)
            kf_stamps = kf_stamps.at[k].set(stamp)
            graph = add_keyframe(graph, corrected_T)
            rel = se3.between(prev_raw_T, raw_T)
            sqrt_info = jnp.asarray(
                [cfg.odom_trans_sqrt_info] * 3 + [cfg.odom_rot_sqrt_info] * 3,
                jnp.float32,
            )
            graph = jax.lax.cond(
                k > 0,
                lambda g: add_between(g, k - 1, k, rel, sqrt_info),
                lambda g: g,
                graph,
            )
            return graph, kf_clouds, kf_masks, kf_raw_poses, kf_stamps

        self._jit_commit_kf = jax.jit(
            _commit_keyframe, donate_argnums=(0, 1, 2, 3, 4)
        )

        # ---- chunked path: S scans per dispatch, keyframe decision + commit
        # on device (lax.cond inside lax.scan) — ONE host sync per chunk
        # instead of one per scan (the whole live path
        # fast_lio_sam.cpp:367-573 minus the loop timer, which the engine
        # runs at chunk boundaries) ----
        @geometry_precision
        def _chunk_rollout(odom, graph, kf_clouds, kf_masks, kf_raw_poses,
                           kf_stamps, kf_n, last_raw, last_corr,
                           scans, imus, stamps, scan_dt):
            def step(carry, inp):
                (odom, graph, clouds, masks, rposes, kstamps, kf_n,
                 last_raw, last_corr) = carry
                scan, imu, stamp = inp
                odom, aux = odom_step(
                    odom, scan, imu, scan_dt, self.odom_cfg, self.map_cfg,
                    map_ops=self.map_ops,
                )
                raw_T = se3.make(aux["R"], aux["p"])
                # realtime delta-chaining (fast_lio_sam.cpp:374-384)
                corrected = se3.compose(
                    last_corr, se3.between(last_raw, raw_T)
                )
                dist = jnp.linalg.norm(se3.trans(raw_T) - se3.trans(last_raw))
                is_kf = (kf_n == 0) | (dist > cfg.keyframe_threshold)

                def commit(args):
                    graph, clouds, masks, rposes, kstamps = args
                    return _commit_keyframe(
                        graph, clouds, masks, rposes, kstamps,
                        kf_n, aux["cloud_world"], aux["cloud_mask"],
                        raw_T, corrected, last_raw, stamp,
                    )

                (graph, clouds, masks, rposes, kstamps) = jax.lax.cond(
                    is_kf,
                    commit,
                    lambda a: a,
                    (graph, clouds, masks, rposes, kstamps),
                )
                kf_n = kf_n + is_kf.astype(jnp.int32)
                last_raw = jnp.where(is_kf, raw_T, last_raw)
                last_corr = jnp.where(is_kf, corrected, last_corr)
                # fused PER-SCAN loop-candidate detection: a masked argmin
                # over ≤max_keyframes rows is trivial beside the iEKF, and
                # carrying (cand, found) for every scan decouples the loop
                # cadence from the chunk size — the host can honor the
                # reference's 2 Hz cadence (loop_check_every) at ANY chunk
                # size instead of only at chunk boundaries (positions are
                # pre-solve, like the reference's loop thread reading
                # whatever poses are current)
                cand, found = fetch_closest_keyframe_idx(
                    se3.trans(graph.poses), kstamps, graph.kf_valid,
                    jnp.maximum(kf_n - 1, 0),
                    self.loop_cfg.radius, self.loop_cfg.time_gap,
                )
                carry = (odom, graph, clouds, masks, rposes, kstamps, kf_n,
                         last_raw, last_corr)
                out = (raw_T, corrected, is_kf, aux["n_matched"],
                       cand, found)
                return carry, out

            carry0 = (odom, graph, kf_clouds, kf_masks, kf_raw_poses,
                      kf_stamps, kf_n, last_raw, last_corr)
            carry, outs = jax.lax.scan(step, carry0, (scans, imus, stamps))
            # ALL host-facing outputs packed into ONE flat array: on a
            # remote-attached device every independent device->host fetch is
            # a full relay round trip (~tens of ms), so the chunk returns a
            # single buffer the host reads once per chunk
            raw_Ts, corr_Ts, is_kf, n_matched, cands, founds = outs
            packed = jnp.concatenate([
                raw_Ts.reshape(-1),
                corr_Ts.reshape(-1),
                is_kf.astype(jnp.float32),
                n_matched.astype(jnp.float32),
                cands.astype(jnp.float32),
                founds.astype(jnp.float32),
            ])
            return carry, packed

        self._jit_chunk = jax.jit(
            _chunk_rollout, donate_argnums=(0, 1, 2, 3, 4, 5)
        )

    # ------------------------------------------------------------------
    # per-scan entry point
    # ------------------------------------------------------------------
    def process(self, scan: Scan, imu: ImuBatch, stamp: float, scan_dt: float,
                gps: Optional[list] = None):
        """Advance the pipeline by one scan. Returns the realtime corrected
        pose (4,4) numpy."""
        for fix in gps or []:
            self._on_gps(fix)

        self.odom, aux = self._jit_odom(
            self.odom, scan, imu, jnp.float32(scan_dt)
        )
        # single small readback per scan; all pose composition below is
        # host-side numpy (eager device ops cost a full round trip each on
        # remote-attached accelerators)
        R_np = np.asarray(aux["R"])
        p_np = np.asarray(aux["p"])
        raw_T = np.eye(4, dtype=np.float32)
        raw_T[:3, :3] = R_np
        raw_T[:3, 3] = p_np

        # realtime correction by delta-chaining (fast_lio_sam.cpp:374-384)
        last_raw = np.asarray(self.last_kf_raw)
        last_corr = np.asarray(self.last_kf_corrected)
        delta = np.linalg.inv(last_raw) @ raw_T
        corrected_T = (last_corr @ delta).astype(np.float32)

        if self._last_p is not None:
            step_d = float(np.linalg.norm(p_np - self._last_p))
            self.traj_len += step_d
            self._dist_since_capture += step_d
        self._last_p = p_np
        # distance-triggered capture hook (the reference's /save_image
        # service call every >= 1 m traveled, fast_lio_sam.cpp:389-407)
        if (
            self.capture_hook is not None
            and self.cfg.capture_distance > 0.0
            and self._dist_since_capture >= self.cfg.capture_distance
        ):
            self._dist_since_capture = 0.0
            self.capture_hook(float(stamp), corrected_T)
        self.raw_traj.append(raw_T)
        self.realtime_traj.append(corrected_T)
        self.scan_stamps.append(float(stamp))

        # keyframe decision (checkIfKeyframe, fast_lio_sam.cpp:1093-1096)
        if self.kf.n == 0:
            self._add_keyframe(raw_T, corrected_T, aux, stamp)
        else:
            dist = float(np.linalg.norm(raw_T[:3, 3] - last_raw[:3, 3]))
            if dist > self.cfg.keyframe_threshold:
                self._add_keyframe(raw_T, corrected_T, aux, stamp)

        # loop-closure cadence (2 Hz timer analog, config.yaml:3)
        if (
            self.scan_count % self.cfg.loop_check_every == 0
            and self.kf.n > 1
        ):
            self._attempt_loop()

        if self._needs_solve:
            self._solve()

        self.scan_count += 1
        return np.asarray(corrected_T)

    # ------------------------------------------------------------------
    # chunked entry point: S scans per dispatch, one host sync per chunk
    # ------------------------------------------------------------------
    def process_chunk(self, scans: Scan, imus: ImuBatch, stamps, scan_dt,
                      gps: Optional[list] = None):
        """Advance the pipeline by a chunk of S scans in ONE device dispatch
        (keyframe decisions + commits run on device inside `lax.scan`).
        Loop detection/verification and PGO solves run at the chunk
        boundary, so choosing S = ``loop_check_every`` reproduces the
        reference's 2 Hz loop-timer cadence exactly. Returns the (S, 4, 4)
        realtime corrected poses."""
        # drain any deferred chunks first — resolves must happen in
        # dispatch order (keyframe counters are cumulative)
        while self._pending_chunks:
            self._resolve_chunk(self._pending_chunks.pop(0))
        handle = self._dispatch_chunk(scans, imus, stamps, scan_dt, gps)
        return self._resolve_chunk(handle)

    def process_chunk_deferred(self, scans: Scan, imus: ImuBatch, stamps,
                               scan_dt, gps: Optional[list] = None):
        """One-chunk-deep software pipeline: dispatch chunk k, THEN resolve
        chunk k-1's readback — so the host sync for k-1 overlaps k's device
        execution, and on a remote-attached accelerator the round-trip
        latency + the chunk-tail loop-ICP/solve work hide behind compute.

        Loop verification and PGO solves consequently run one chunk later
        than in :meth:`process_chunk` — the same asynchrony the reference
        has between its odometry callback and its 2 Hz loop thread
        (`fast_lio_sam.cpp:137`, the loop factor lands whenever the timer
        fires). Still deterministic: the lag is structural, not timing-
        dependent. Returns chunk k-1's corrected poses (None on the first
        call); `finish()` resolves the final chunk."""
        handle = self._dispatch_chunk(scans, imus, stamps, scan_dt, gps)
        self._pending_chunks.append(handle)
        out = None
        while len(self._pending_chunks) > max(1, self.cfg.defer_depth):
            out = self._resolve_chunk(self._pending_chunks.pop(0))
        return out

    def _dispatch_chunk(self, scans, imus, stamps, scan_dt, gps):
        for fix in gps or []:
            self._on_gps(fix)
        S = scans.xyz.shape[0]
        # invariant: mutating pgo_cfg without reset() leaves the device
        # stores at the OLD capacity while the pre-grow arithmetic trusts
        # the new one — on-device adds would then mask-no-op silently
        assert self.graph.poses.shape[0] == self.pgo_cfg.max_keyframes, (
            "pgo_cfg.max_keyframes changed without engine.reset(): graph "
            f"capacity {self.graph.poses.shape[0]} != "
            f"{self.pgo_cfg.max_keyframes}"
        )
        # pre-grow so on-device adds can never hit the masked no-op
        # backstop; with chunks still in flight their (unresolved) keyframe
        # adds are bounded by their scan counts
        pend = sum(h[2] for h in self._pending_chunks)
        while self.kf.n + pend + S > self.pgo_cfg.max_keyframes:
            self._grow_keyframes()
        while self._n_bt_host + pend + S > self.pgo_cfg.max_between:
            self._grow_between()

        stamps_np = np.asarray(stamps, np.float32)
        dt = float(scan_dt)
        dt_dev = self._dt_cache.get(dt)
        if dt_dev is None:
            dt_dev = self._dt_cache[dt] = jnp.float32(dt)
        kf_n_dev = (
            self._kf_n_dev if self._kf_n_dev is not None
            else jnp.int32(self.kf.n)
        )
        carry, packed = self._jit_chunk(
            self.odom, self.graph, self.kf.clouds, self.kf.masks,
            self.kf.raw_poses, self.kf.stamps,
            kf_n_dev,
            jnp.asarray(self.last_kf_raw, jnp.float32),
            jnp.asarray(self.last_kf_corrected, jnp.float32),
            scans, imus, jnp.asarray(stamps_np), dt_dev,
        )
        (self.odom, self.graph, clouds, masks, rposes, kstamps, kf_n,
         last_raw, last_corr) = carry
        self.kf.clouds, self.kf.masks = clouds, masks
        self.kf.raw_poses, self.kf.stamps = rposes, kstamps
        # next-chunk inputs stay device-resident (lazy) — no round trip
        self._kf_n_dev = kf_n
        self.last_kf_raw = last_raw
        self.last_kf_corrected = last_corr
        return packed, stamps_np, S

    def _resolve_chunk(self, handle):
        packed, stamps_np, S = handle
        # ONE host readback for the whole chunk
        flat = np.asarray(packed)
        raw_np = flat[: 16 * S].reshape(S, 4, 4)
        corr_np = flat[16 * S: 32 * S].reshape(S, 4, 4)
        kf_np = flat[32 * S: 33 * S] > 0.5
        cands = flat[34 * S: 35 * S].astype(np.int32)
        founds = flat[35 * S: 36 * S] > 0.5
        new_kf = int(kf_np.sum())
        first_kf_idx = self.kf.n
        self.kf.n += new_kf
        self._n_bt_host += new_kf - (1 if first_kf_idx == 0 and new_kf else 0)

        # host bookkeeping per scan (numpy, no device traffic)
        kf_counter = first_kf_idx
        for s in range(S):
            p = raw_np[s, :3, 3]
            if self._last_p is not None:
                step_d = float(np.linalg.norm(p - self._last_p))
                self.traj_len += step_d
                self._dist_since_capture += step_d
            self._last_p = p
            if (
                self.capture_hook is not None
                and self.cfg.capture_distance > 0.0
                and self._dist_since_capture >= self.cfg.capture_distance
            ):
                self._dist_since_capture = 0.0
                self.capture_hook(float(stamps_np[s]), corr_np[s])
            self.raw_traj.append(raw_np[s])
            self.realtime_traj.append(corr_np[s])
            self.scan_stamps.append(float(stamps_np[s]))
            if kf_np[s]:
                if self.cfg.use_gps:
                    self._try_add_gps_factor(
                        kf_counter, float(stamps_np[s]), corr_np[s]
                    )
                kf_counter += 1
        self.scan_count += S

        if self.cfg.solve_per_keyframe and new_kf > 0:
            self._needs_solve = True
        # loop cadence: per-scan candidates came back fused with the chunk
        # outputs, so the reference's 2 Hz cadence (loop_check_every) is
        # honored at ANY chunk size — attempt at every cadence scan inside
        # the chunk, dedup by the processed-flag; only the ICP
        # verifications (and only when a candidate exists) cost extra
        # (async) dispatches
        self._resolve_pending_loop()
        gidx0 = self.scan_count - S  # global index of this chunk's scan 0
        kf_cum = np.cumsum(kf_np)
        every = self.cfg.loop_check_every
        for s in range(S):
            if (gidx0 + s + 1) % every:
                continue
            k_s = first_kf_idx + int(kf_cum[s])
            if k_s > 1 and k_s - 1 > self._loop_processed_kf:
                self._loop_processed_kf = k_s - 1
                if founds[s]:
                    self._launch_verify(k_s - 1, int(cands[s]))
        if self._needs_solve:
            self._solve()
        return corr_np

    # ------------------------------------------------------------------
    # capacity policy: grow (double) or fail loudly — never drop silently
    # ------------------------------------------------------------------
    def _capacity_event(self, what: str, old: int, new: int):
        import warnings

        if self.cfg.capacity_policy == "error":
            raise RuntimeError(
                f"pose-graph {what} capacity exhausted at {old} "
                f"(capacity_policy='error'; use 'grow' or raise the limit)"
            )
        warnings.warn(
            f"pose-graph {what} capacity {old} reached — growing to {new} "
            f"(solver recompiles at the new shape)",
            stacklevel=3,
        )

    def _grow_keyframes(self):
        old = self.pgo_cfg.max_keyframes
        new = old * 2
        self._capacity_event("keyframe", old, new)
        self.pgo_cfg = self.pgo_cfg._replace(max_keyframes=new)
        self.graph = grow(self.graph, self.pgo_cfg)
        eye_pad = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (old, 4, 4))
        self.kf = KeyframeStore(
            clouds=jnp.concatenate(
                [self.kf.clouds, jnp.zeros_like(self.kf.clouds)], axis=0
            ),
            masks=jnp.concatenate(
                [self.kf.masks, jnp.zeros_like(self.kf.masks)], axis=0
            ),
            raw_poses=jnp.concatenate([self.kf.raw_poses, eye_pad], axis=0),
            stamps=jnp.concatenate(
                [self.kf.stamps, jnp.zeros_like(self.kf.stamps)], axis=0
            ),
            n=self.kf.n,
        )

    def _grow_between(self):
        old = self.pgo_cfg.max_between
        new = old * 2
        self._capacity_event("between-factor", old, new)
        self.pgo_cfg = self.pgo_cfg._replace(max_between=new)
        self.graph = grow(self.graph, self.pgo_cfg)

    def _grow_gps(self):
        old = self.pgo_cfg.max_gps
        new = old * 2
        self._capacity_event("GPS-factor", old, new)
        self.pgo_cfg = self.pgo_cfg._replace(max_gps=new)
        self.graph = grow(self.graph, self.pgo_cfg)

    # ------------------------------------------------------------------
    def _add_keyframe(self, raw_T, corrected_T, aux, stamp):
        k = self.kf.n
        if k >= self.pgo_cfg.max_keyframes:
            self._grow_keyframes()
        if k > 0:
            if self._n_bt_host >= self.pgo_cfg.max_between:
                self._grow_between()
            self._n_bt_host += 1
        # store body-frame cloud (PosePcd stores LiDAR-frame clouds,
        # pose_pcd.hpp:39-40) + graph entries in ONE jitted dispatch
        prev_raw = self.last_kf_raw
        (
            self.graph,
            self.kf.clouds,
            self.kf.masks,
            self.kf.raw_poses,
            self.kf.stamps,
        ) = self._jit_commit_kf(
            self.graph,
            self.kf.clouds,
            self.kf.masks,
            self.kf.raw_poses,
            self.kf.stamps,
            jnp.int32(k),
            aux["cloud_world"],
            aux["cloud_mask"],
            jnp.asarray(raw_T, jnp.float32),
            jnp.asarray(corrected_T, jnp.float32),
            jnp.asarray(prev_raw, jnp.float32),
            jnp.float32(stamp),
        )
        self.kf.n = k + 1
        self._kf_n_dev = None  # host counter is now authoritative
        self.last_kf_raw = np.asarray(raw_T)
        self.last_kf_corrected = np.asarray(corrected_T)

        if self.cfg.use_gps:
            self._try_add_gps_factor(k, stamp, corrected_T)
        if self.cfg.solve_per_keyframe:
            self._needs_solve = True

    # ------------------------------------------------------------------
    def _attempt_loop(self):
        # resolve a previously launched (asynchronously computed)
        # verification first — by now its device work has completed in the
        # background, so reading the accept flag costs ~nothing
        self._resolve_pending_loop()
        k = self.kf.n
        # processed-flag dedup (fast_lio_sam.cpp:684-689): each keyframe is
        # loop-attempted at most once — when the vehicle dwells, the same
        # (query, cand) pair is never re-ICP'd or re-added
        if k - 1 <= self._loop_processed_kf:
            return
        self._loop_processed_kf = k - 1
        positions = se3.trans(self.graph.poses)
        idx, found = self._jit_detect(
            positions, self.kf.stamps, self.graph.kf_valid, k - 1
        )
        if not bool(found):
            return
        self._launch_verify(k - 1, int(idx))

    def _launch_verify(self, query: int, cand: int):
        out = self._jit_verify(
            self.kf.clouds,
            self.kf.masks,
            self.graph.poses,
            self.graph.kf_valid,
            jnp.int32(query),
            jnp.int32(cand),
        )
        # async: don't force the result now; JAX dispatch lets the ICP run
        # (optionally on another device) while odometry continues
        self._pending_loops.append((query, cand, out))

    def _resolve_pending_loop(self):
        while self._pending_loops:
            qi, ci, (rel, sqrt_info, accepted, fitness) = (
                self._pending_loops.pop(0)
            )
            self.loop_attempts.append(
                (qi, ci, float(fitness), bool(accepted))
            )
            if bool(accepted):
                if self._n_bt_host >= self.pgo_cfg.max_between:
                    self._grow_between()
                self._n_bt_host += 1
                self.graph = add_between(self.graph, qi, ci, rel, sqrt_info)
                self.loop_pairs.append((qi, ci))
                self.loop_rels.append(np.asarray(rel))
                self.loop_fitness.append(float(fitness))
                self._needs_solve = True

    # ------------------------------------------------------------------
    def _solve(self):
        self.graph, cost = self._jit_solve(self.graph)
        self.solve_count += 1
        self._needs_solve = False
        k = self.kf.n
        # feedback: re-anchor realtime correction at the latest keyframe
        # (fast_lio_sam.cpp:515-537 corrected-estimate readback). Kept as
        # lazy device arrays: the chunked path feeds them straight into the
        # next chunk dispatch, so a solve never blocks the host — only the
        # per-scan path's numpy composition forces the transfer.
        self.last_kf_corrected = self.graph.poses[k - 1]
        self.last_kf_raw = self.kf.raw_poses[k - 1]
        if self.cfg.use_gps:
            # pose_covariance_ readback (fast_lio_sam.cpp:523): full 6×6
            # marginal + solved position in ONE fetch — the cross
            # (translation, yaw) terms feed the between-solve extrapolation
            cov, p = self._jit_marginal(self.graph, jnp.int32(k - 1))
            self._cov6 = np.asarray(cov)
            self._cov_solved_kf = k - 1
            self._cov_solved_p = np.asarray(p)[:2].astype(np.float64)
            self._cov_solved_trajlen = self.traj_len

    def _pose_cov_estimate(self, kf_idx, p_now):
        """x/y translation marginal variance of keyframe ``kf_idx`` at
        position ``p_now``: the marginal at the last solve propagated by
        first-order dead reckoning (`pgo.extrapolate_pose_cov` — between
        solves iSAM2 would have tracked this; we extrapolate instead of
        re-factorizing every keyframe)."""
        if self._cov6 is None:
            return np.full((2,), np.inf)
        from ..pgo import extrapolate_pose_cov

        return extrapolate_pose_cov(
            self._cov6,
            max(kf_idx - self._cov_solved_kf, 0),
            max(self.traj_len - self._cov_solved_trajlen, 0.0),
            np.asarray(p_now, np.float64)[:2] - self._cov_solved_p,
            1.0 / self.cfg.odom_trans_sqrt_info**2,
            1.0 / self.cfg.odom_rot_sqrt_info**2,
        )

    # ------------------------------------------------------------------
    # GPS path (gpsCallback + add_gps_factor, fast_lio_sam.cpp:148-260)
    # ------------------------------------------------------------------
    def _on_gps(self, fix: GpsFix):
        if fix.status != 0:  # reject non-fix solutions (:151-152)
            return
        if self.gps_anchor is None:
            self.gps_anchor = LocalCartesian.from_origin(
                fix.lat, fix.lon, fix.alt
            )
            if self.cfg.gps_anchor_warmup <= 1:
                # reference-exact: anchor at the first fix, offset = the
                # current SLAM position
                self._gps_warmup = None
                if self.realtime_traj:
                    self.gps_slam_offset = (
                        self.realtime_traj[-1][:3, 3].copy()
                    )
        enu_raw = np.asarray(
            self.gps_anchor.forward(
                jnp.asarray(fix.lat), jnp.asarray(fix.lon), jnp.asarray(fix.alt)
            )
        )
        noise = np.sqrt(np.asarray(fix.cov_xyz))
        if self._gps_warmup is not None:
            self._gps_warmup.append((fix.stamp, enu_raw, noise))
            # stamp-matching clearly failing (e.g. GPS clock offset,
            # sparse scans): don't buffer forever — finalize with whatever
            # matched rather than silently discarding every fix
            force = len(self._gps_warmup) >= max(
                3 * self.cfg.gps_anchor_warmup, self.cfg.gps_anchor_warmup + 5
            )
            self._try_finalize_gps_anchor(force=force)
            return
        self.gps_queue.append(
            (fix.stamp, enu_raw + self.gps_slam_offset, noise)
        )

    def _try_finalize_gps_anchor(self, force: bool = False):
        """Average the SLAM−ENU offset over the warmup fixes that have a
        realtime pose within ``gps_time_tol`` of their stamp, then flush
        them into the fusion queue (see EngineConfig.gps_anchor_warmup).

        ``force`` finalizes with however many fixes matched (short or
        sparse-GPS sequences where the warmup quota is never reached —
        ``finish()`` forces so buffered fixes are never silently dropped);
        when NO fix matched any scan stamp it falls back to the
        reference's first-fix anchoring (`fast_lio_sam.cpp:156-159`)."""
        if self._gps_warmup is None or (not force and not self.scan_stamps):
            return
        tol = self.cfg.gps_time_tol
        stamps = (
            np.asarray(self.scan_stamps) if self.scan_stamps else None
        )
        matched = []
        if stamps is not None:
            for (ts, enu, noise) in self._gps_warmup:
                j = int(np.argmin(np.abs(stamps - ts)))
                if abs(float(stamps[j]) - ts) <= tol:
                    matched.append((ts, enu, noise,
                                    self.realtime_traj[j][:3, 3]))
        need = 1 if force else self.cfg.gps_anchor_warmup
        if len(matched) < need:
            if not force:
                return
            # nothing matched: reference-exact first-fix anchoring — the
            # offset is the SLAM position nearest the first fix (zero with
            # no trajectory, i.e. SLAM origin == first fix)
            if stamps is not None and self._gps_warmup:
                j = int(np.argmin(np.abs(stamps - self._gps_warmup[0][0])))
                self.gps_slam_offset = self.realtime_traj[j][:3, 3].copy()
        else:
            self.gps_slam_offset = np.mean(
                [p - enu for (_, enu, _, p) in matched], axis=0
            )
        buffered, self._gps_warmup = self._gps_warmup, None
        for (ts, enu, noise) in buffered:
            self.gps_queue.append((ts, enu + self.gps_slam_offset, noise))

    def _velocity_at(self, t: float) -> np.ndarray:
        """World-frame velocity at time ``t``, finite-differenced from the
        corrected realtime trajectory (used by GPS motion compensation)."""
        st = self.scan_stamps
        if len(st) < 2:
            return np.zeros(3)
        i = int(np.clip(np.searchsorted(st, t), 1, len(st) - 1))
        dt = st[i] - st[i - 1]
        if dt <= 1e-6:
            return np.zeros(3)
        return (
            self.realtime_traj[i][:3, 3] - self.realtime_traj[i - 1][:3, 3]
        ) / dt

    def _try_add_gps_factor(self, kf_idx, kf_stamp, corrected_T):
        cfg = self.cfg
        if self.traj_len < cfg.min_traj_len:  # :183-189
            return
        # skip while the pose is already well-constrained (:192-193): both
        # x and y translation marginals below pose_cov_thres
        pose_cov = self._pose_cov_estimate(kf_idx, corrected_T[:3, 3])
        if pose_cov[0] < cfg.pose_cov_thres and pose_cov[1] < cfg.pose_cov_thres:
            return
        # queue scrub around the keyframe stamp (:198-209)
        while self.gps_queue and self.gps_queue[0][0] < kf_stamp - cfg.gps_time_tol:
            self.gps_queue.pop(0)
        if not self.gps_queue:
            return
        stamp, enu, noise = self.gps_queue[0]
        if stamp > kf_stamp + cfg.gps_time_tol:
            return
        self.gps_queue.pop(0)
        if noise[0] > cfg.gps_cov_thres or noise[1] > cfg.gps_cov_thres:  # :216-220
            return
        if np.allclose(enu, 0.0):  # skip (0,0,0) (:236)
            return
        if cfg.gps_motion_comp and abs(stamp - kf_stamp) > 1e-6:
            # propagate the fix position to the keyframe stamp (see
            # EngineConfig.gps_motion_comp) — the residual stamp mismatch
            # otherwise folds v·Δt of real motion into the factor
            enu = enu + self._velocity_at(kf_stamp) * (kf_stamp - stamp)
        if (
            self.last_gps_factor_pos is not None
            and np.linalg.norm(enu[:2] - self.last_gps_factor_pos[:2])
            < cfg.gps_dist_thres
        ):  # :244-247
            return
        z = enu.copy()
        if not cfg.use_gps_elevation:  # z from SLAM (:228-233)
            z[2] = float(se3.trans(corrected_T)[2])
            noise = noise.copy()
            noise[2] = 0.01
        noise = np.maximum(noise, cfg.gps_noise_floor)  # :252
        sqrt_info = jnp.asarray(1.0 / noise, jnp.float32)
        if self._n_gps_host >= self.pgo_cfg.max_gps:
            self._grow_gps()
        self._n_gps_host += 1
        self.graph = add_gps(
            self.graph, kf_idx, jnp.asarray(z, jnp.float32), sqrt_info
        )
        self.last_gps_factor_pos = enu
        self._needs_solve = True

    # ------------------------------------------------------------------
    # outputs
    # ------------------------------------------------------------------
    def finish(self):
        """Resolve any in-flight chunk + loop verification and run a final
        solve — call once at end of sequence (save_results does)."""
        while self._pending_chunks:
            self._resolve_chunk(self._pending_chunks.pop(0))
        # never end a run with GPS fixes stranded in the anchor-warmup
        # buffer (short or sparse-GPS sequences that miss the quota):
        # finalize with whatever matched and retro-attach factors to the
        # keyframes the flushed fixes correspond to
        if (
            self.cfg.use_gps
            and self._gps_warmup is not None
            and self._gps_warmup
        ):
            self._try_finalize_gps_anchor(force=True)
            if self.gps_queue and self.kf.n > 0:
                kf_stamps = np.asarray(self.kf.stamps[: self.kf.n])
                kf_poses = np.asarray(self.graph.poses[: self.kf.n])
                for k in range(self.kf.n):
                    self._try_add_gps_factor(
                        k, float(kf_stamps[k]), kf_poses[k]
                    )
        self._resolve_pending_loop()
        if self._needs_solve:
            self._solve()

    def keyframe_poses(self):
        """Corrected keyframe poses (n, 4, 4) numpy."""
        return np.asarray(self.graph.poses[: self.kf.n])

    def keyframe_stamps(self):
        return np.asarray(self.kf.stamps[: self.kf.n])

    def assemble_map(self, voxel: float = 0.3, max_points: int = 1 << 20):
        """Global corrected map (saveFlagCallback/visTimer map assembly,
        `fast_lio_sam.cpp:781-799,888-938`)."""
        world = se3.apply(self.graph.poses[: self.kf.n], self.kf.clouds[: self.kf.n])
        flat = world.reshape(-1, 3)
        fmask = self.kf.masks[: self.kf.n].reshape(-1)
        ds = voxel_downsample(Cloud(xyz=flat, mask=fmask), voxel)
        pts = np.asarray(ds.xyz)[np.asarray(ds.mask)]
        return pts[:max_points]
