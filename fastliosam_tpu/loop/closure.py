"""Submap assembly + loop verification.

Equivalent of ``LoopClosure::setSrcAndDstCloud`` / ``performLoopClosure``
(`loop_closure.cpp:42-126`): accumulate ±num_submap_keyframes around the
query and the candidate in the world frame (using the *corrected* poses),
voxelize, and run ICP. The accepted transform produces the between-factor
endpoints exactly as the reference wires them (`fast_lio_sam.cpp:699-713`):
``pose_from = icp_tf · T_query``, ``pose_to = T_candidate``, factor noise
``fitness · I₆``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import se3
from ..core.pointcloud import Cloud, voxel_downsample
from .icp import icp_align, icp_align_p2pl
from ..utils.precision import geometry_precision


class LoopConfig(NamedTuple):
    radius: float = 35.0  # loop_detection_radius (config.yaml:11)
    time_gap: float = 30.0  # loop_detection_timediff_threshold (config.yaml:12)
    num_submap_keyframes: int = 5  # config.yaml:8
    voxel_res: float = 0.3  # config.yaml:15
    icp_score_threshold: float = 1.5  # config.yaml:16
    max_iterations: int = 50
    convergence_eps: float = 0.01  # PCL setTransformationEpsilon analog
    max_corr_factor: float = 1.5  # max corr dist = radius * this
    submap_points: int = 16384  # static budget of each assembled submap
    nn_chunk: int = 2048
    trim_fraction: float = 0.8  # trimmed-ICP fraction (1.0 = reference-like)
    # DELIBERATE DIVERGENCE from the reference: pcl::ICP accepts on
    # `converged && fitness < threshold` alone (`loop_closure.cpp:85`); a
    # fitness computed over a handful of correspondences is meaningless, so
    # we additionally require this many in-range correspondences. Set to 0
    # for reference-exact acceptance.
    min_correspondences: int = 100
    # DELIBERATE DIVERGENCE #2 — anisotropic loop-factor noise: in
    # translationally self-similar geometry (urban canyon, corridor) ICP
    # converges with a small fitness while having slid freely along the
    # unconstrained axis; the reference's isotropic `fitness·I₆` noise
    # (`fast_lio_sam.cpp:710`) then fuses that slide at full strength
    # (measured on the 1160-scan canyon circuit: accepted loops carrying
    # 13-15 m along-street error at 0° rotation error, ATE 2 → 12 m). The
    # translation sqrt-info is scaled per candidate-body axis by the
    # destination submap's surface-normal coverage of that axis — walls ⊥ ŷ
    # and ground ⊥ ẑ constrain nothing along x̂, so the factor goes soft
    # exactly there. False disables (reference-exact noise).
    # ICP variant: "point" (reference-exact point-to-point PCL semantics,
    # loop_closure.cpp:69-92 — the default; measured best on the canyon
    # circuit, where p2pl's freedom to slide within wall planes produced
    # two extra 20 m slides) or "p2pl" (point-to-plane against destination
    # surfel normals — see icp.icp_align_p2pl; the better choice on rich
    # real-world geometry where sampling bias, not self-similarity, is
    # the binding error).
    icp_method: str = "point"
    aniso_noise: bool = True
    aniso_voxel: float = 1.0  # normal-estimation voxel size (m)
    aniso_tau: float = 0.3  # relative normal coverage for full strength
    aniso_floor: float = 0.02  # minimum sqrt-info scale along weak axes
    # coverage band (in scale_t units, below full strength 1.0) over which
    # the translation sqrt-info interpolates continuously from the
    # absolute weak-axis scale to the fitness-based info — a hard switch
    # at full coverage was a ~30x information cliff between nearly
    # identical geometries (scale_t 0.998 vs 1.0). 0 restores the switch.
    aniso_blend: float = 0.25
    # reject (not just soften) a loop whose ICP correction MOVES the query
    # pose farther than this along a weak axis: that displacement is the
    # slide itself — the submap had no information to produce it, so it is
    # initialization error, not measurement. Corner loops (all axes
    # constrained) pass at any correction size, which is what lets the
    # graph recover from large drift; Huber-style residual gating cannot
    # make that distinction (measured: loop_huber capped the CORRECT far
    # corrections too and the circuit ATE got worse, 12 → 22 m). 0 disables.
    degen_move_limit: float = 2.0
    # multi-start ICP: ICP's basin of attraction on street-like geometry
    # is narrower than the drift at loop time (measured on the circuit
    # worlds: candidates sit 6-17 m off and single-start ICP converges
    # into a lattice-slid local minimum that still scores fitness < 1.5).
    # With M > 1 the verifier batches a COARSE ICP (multistart_iters) over
    # M initial translations spaced multistart_step apart along the
    # destination submap's weakest normal-coverage direction — slides
    # live exactly along that axis — then refines the best-fitness winner
    # with the full budget. vmapped: the M starts run as one batched
    # program (TPU-friendly), ~2x the single-start cost at M=5.
    # 1 = reference-exact single start.
    icp_multistart: int = 1
    multistart_step: float = 4.0
    multistart_iters: int = 12
    # cap on the fitness-based sqrt information (1/m): PCL fitness is mean
    # squared NN distance, which measures how well SURFACES overlap, not
    # how well the transform is constrained — on self-similar geometry a
    # slid alignment scores fitness ~0.01 and the reference's
    # 1/sqrt(fitness) noise then claims ~10 cm loop accuracy while the
    # actual transform error is metres (r5 oracle: per-loop error 2-6 m,
    # perfect-loop floor 0.85 m vs 7.35 m achieved — the gap IS
    # overconfident loop info). A cap of 1.0 = "no loop claims better
    # than 1 m sigma"; 0 disables (reference-exact).
    max_sqrt_info: float = 0.0

    @classmethod
    def reference_exact(cls, **overrides):
        """Every documented divergence restored to the reference spec
        (PARITY.md 'Divergence audit'): radius 35 m / 30 s gap
        (`config.yaml:11-12`), untrimmed point-to-point PCL ICP accepted on
        `fitness < 1.5` alone (`loop_closure.cpp:69-92`), isotropic
        `fitness·I₆` factor noise (`fast_lio_sam.cpp:710`), no
        correspondence floor, no slide rejection. Framework-only budgets
        (submap_points, nn_chunk) keep their defaults or ``overrides``."""
        base = dict(
            radius=35.0, time_gap=30.0, num_submap_keyframes=5,
            voxel_res=0.3, icp_score_threshold=1.5, max_iterations=50,
            convergence_eps=0.01, max_corr_factor=1.5, trim_fraction=1.0,
            min_correspondences=0, icp_method="point", aniso_noise=False,
            degen_move_limit=0.0,
        )
        base.update(overrides)
        return cls(**base)


def build_submap(
    kf_clouds,  # (K, P, 3) keyframe clouds in *body* frame (PosePcd analog)
    kf_cloud_masks,  # (K, P)
    poses,  # (K, 4, 4) corrected keyframe poses
    kf_valid,  # (K,)
    center_idx,  # scalar int32
    cfg: LoopConfig,
):
    """World-frame submap of ±num_submap_keyframes around ``center_idx``,
    voxelized and packed to the static ``submap_points`` budget."""
    span = 2 * cfg.num_submap_keyframes + 1
    offs = jnp.arange(-cfg.num_submap_keyframes, cfg.num_submap_keyframes + 1)
    K = kf_clouds.shape[0]
    idx = jnp.clip(center_idx + offs, 0, K - 1)
    in_range = (center_idx + offs >= 0) & (center_idx + offs < K)
    sel_valid = kf_valid[idx] & in_range  # (span,)
    clouds = kf_clouds[idx]  # (span, P, 3)
    masks = kf_cloud_masks[idx] & sel_valid[:, None]
    T = poses[idx]  # (span, 4, 4)
    world = se3.apply(T, clouds)  # (span, P, 3)
    flat = world.reshape(span * kf_clouds.shape[1], 3)
    fmask = masks.reshape(-1)
    ds = voxel_downsample(Cloud(xyz=flat, mask=fmask), cfg.voxel_res)
    budget = min(cfg.submap_points, ds.xyz.shape[0])
    return ds.xyz[:budget], ds.mask[:budget]


@geometry_precision
def verify_loop(
    kf_clouds,
    kf_cloud_masks,
    poses,
    kf_valid,
    query_idx,
    cand_idx,
    cfg: LoopConfig,
    icp_fn=None,
):
    """ICP-verify a loop candidate.

    Returns ``(rel, sqrt_info, accepted, fitness)`` where ``rel`` is the
    between-factor measurement from query to candidate
    (``(icp_tf · T_q)⁻¹ · T_c``) and sqrt_info the diagonal sqrt information
    ``1/sqrt(fitness)`` (reference noise = Variances(fitness · I₆)).

    ``icp_fn`` overrides the submap alignment backend:
    ``(src, src_mask, dst, dst_mask) -> (T, fitness, n_corr)`` — the
    multi-device point-sharded ICP (`parallel/sharded_loop.py:
    icp_align_sharded`) plugs in here for the mesh-mode engine.
    """
    src, src_mask = build_submap(
        kf_clouds, kf_cloud_masks, poses, kf_valid, query_idx, cfg
    )
    dst, dst_mask = build_submap(
        kf_clouds, kf_cloud_masks, poses, kf_valid, cand_idx, cfg
    )
    # surfel map of the destination submap: per-point normals for
    # point-to-plane ICP + the normal-coverage Gram for anisotropic noise
    # + the weak-direction for the multi-start search
    multistart = cfg.icp_multistart > 1 and icp_fn is None
    need_surfels = (
        cfg.icp_method == "p2pl" or cfg.aniso_noise or multistart
    )
    if need_surfels:
        dst_map, dst_map_cfg = _dst_surfel_map(dst, dst_mask, cfg)
    init_T = jnp.eye(4, dtype=jnp.float32)
    if multistart:
        init_T = _multistart_init(
            src, src_mask, dst, dst_mask, dst_map, cfg
        )
    if icp_fn is not None:
        icp_tf, fitness, n_corr = icp_fn(src, src_mask, dst, dst_mask)
    elif cfg.icp_method == "p2pl":
        from ..map import voxel_hash as vh

        nrm_pts, _d_pts, nvalid = vh.query_planes(
            dst_map, dst_map_cfg, dst, dst_mask
        )
        icp_tf, fitness, n_corr = icp_align_p2pl(
            src,
            src_mask,
            dst,
            dst_mask,
            nrm_pts,
            nvalid,
            init_T=init_T,
            max_iterations=cfg.max_iterations,
            max_corr_dist=cfg.radius * cfg.max_corr_factor,
            nn_chunk=cfg.nn_chunk,
            trim_fraction=cfg.trim_fraction,
            convergence_eps=cfg.convergence_eps,
        )
    else:
        icp_tf, fitness, n_corr = icp_align(
            src,
            src_mask,
            dst,
            dst_mask,
            init_T=init_T,
            max_iterations=cfg.max_iterations,
            max_corr_dist=cfg.radius * cfg.max_corr_factor,
            nn_chunk=cfg.nn_chunk,
            trim_fraction=cfg.trim_fraction,
            convergence_eps=cfg.convergence_eps,
        )
    accepted = (fitness < cfg.icp_score_threshold) & (
        n_corr > cfg.min_correspondences
    )
    T_q = poses[query_idx]
    T_c = poses[cand_idx]
    pose_from = se3.compose(icp_tf, T_q)  # fast_lio_sam.cpp:703 ordering
    rel = se3.between(pose_from, T_c)
    base_info = 1.0 / jnp.sqrt(jnp.maximum(fitness, 1e-4))
    if cfg.max_sqrt_info > 0.0:
        # translation only: ICP slides are translational; rotation is
        # well-constrained whenever the alignment is accepted at all
        t_info = jnp.minimum(base_info, cfg.max_sqrt_info)
        sqrt_info = jnp.concatenate(
            [jnp.full((3,), t_info), jnp.full((3,), base_info)]
        ).astype(jnp.float32)
    else:
        sqrt_info = jnp.full((6,), base_info, jnp.float32)
    if cfg.aniso_noise:
        R_c = se3.rot(T_c)
        scale_t = _aniso_translation_scales_from_map(dst_map, R_c, cfg)
        # weak axes get an ABSOLUTE sqrt-info (scale per metre), not a
        # fraction of 1/sqrt(fitness): fitness is tiny precisely when the
        # walls align after a slide, so a multiplicative discount still
        # left sigma~2 m against 20 m slide residuals (measured: the
        # softened canyon loops still pulled the circuit to ATE 7.5 m).
        # scale 0.02 => sigma 50 m along the unconstrained street axis.
        base = sqrt_info[:3]
        if cfg.aniso_blend > 0.0:
            # continuous ramp over the top of the coverage range: axes at
            # full coverage carry the fitness-based info, axes below the
            # band carry the absolute per-metre scale, and the band
            # interpolates between them (see LoopConfig.aniso_blend)
            u = jnp.clip(
                (scale_t - (1.0 - cfg.aniso_blend)) / cfg.aniso_blend,
                0.0,
                1.0,
            )
            trans_info = scale_t + u * (base - scale_t)
        else:
            trans_info = jnp.where(scale_t >= 0.999, base, scale_t)
        sqrt_info = jnp.concatenate([trans_info, sqrt_info[3:]])
        if cfg.degen_move_limit > 0.0:
            # slide rejection (degen_move_limit doc): correction of the
            # query position, expressed in the candidate body frame
            d_body = R_c.T @ (se3.trans(pose_from) - se3.trans(T_q))
            weak = scale_t < 1.0  # axes below full normal coverage
            slid = jnp.any(
                weak & (jnp.abs(d_body) > cfg.degen_move_limit)
            )
            accepted = accepted & ~slid
    return rel, sqrt_info, accepted, fitness


def _multistart_init(src, src_mask, dst, dst_mask, dst_map,
                     cfg: LoopConfig):
    """Coarse multi-start search (see ``LoopConfig.icp_multistart``):
    run a short ICP from M initial translations spaced along the
    destination submap's weakest normal-coverage direction (the axis
    slides live on) and return the best-fitness coarse transform as the
    refinement seed. The M starts are one vmapped program."""
    import jax

    from ..core.eigh3 import eigh3

    w = dst_map.plane_valid.astype(jnp.float32)
    Gw = (dst_map.normal * w[:, None]).T @ dst_map.normal
    lam, V = eigh3(0.5 * (Gw + Gw.T))
    axis = V[:, jnp.argmin(lam)]
    # slides are horizontal (vehicle motion): project out z, normalize
    axis = axis.at[2].set(0.0)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-6)
    M = cfg.icp_multistart
    offs = (jnp.arange(M, dtype=jnp.float32) - (M - 1) / 2.0) * \
        cfg.multistart_step
    inits = jnp.broadcast_to(
        jnp.eye(4, dtype=jnp.float32), (M, 4, 4)
    ).at[:, :3, 3].set(offs[:, None] * axis[None, :])

    def coarse(T0):
        return icp_align(
            src, src_mask, dst, dst_mask, init_T=T0,
            max_iterations=cfg.multistart_iters,
            max_corr_dist=cfg.radius * cfg.max_corr_factor,
            nn_chunk=cfg.nn_chunk,
            trim_fraction=cfg.trim_fraction,
            convergence_eps=cfg.convergence_eps,
        )

    # lax.map, not vmap: the MXU brute-force NN already saturates the chip
    # per start (batching M would not speed it up), and the Pallas NN
    # kernel needs no batching rule this way
    Ts, fits, _ = jax.lax.map(coarse, inits)
    return Ts[jnp.argmin(fits)]


def _dst_surfel_map(dst, dst_mask, cfg: LoopConfig):
    """Throwaway voxel-surfel map of the destination submap (plane cache
    refreshed): feeds both the point-to-plane ICP normals and the
    anisotropic-noise coverage Gram."""
    from ..map import voxel_hash as vh

    vm_cfg = vh.VoxelMapConfig(
        capacity=1 << 14, voxel_size=cfg.aniso_voxel, min_points=5
    )
    m = vh.make_map(vm_cfg)
    m, _ = vh.insert(m, vm_cfg, dst, dst_mask, refresh_planes=True)
    return m, vm_cfg


def _aniso_translation_scales(dst, dst_mask, R_c, cfg: LoopConfig):
    """See `_aniso_translation_scales_from_map` — standalone entry that
    builds the surfel map itself (used by tests)."""
    m, _ = _dst_surfel_map(dst, dst_mask, cfg)
    return _aniso_translation_scales_from_map(m, R_c, cfg)


def _aniso_translation_scales_from_map(m, R_c, cfg: LoopConfig):
    """Per-axis translation sqrt-info scales (candidate body frame) from
    the destination submap's surface-normal coverage (see
    ``LoopConfig.aniso_noise``). An axis only constrains ICP if surfaces
    face it: the coverage Gram ``Σ_voxels n nᵀ`` over per-voxel plane
    normals, rotated into the candidate body frame (the between residual's
    tangent frame), gives each axis's share; axes below ``aniso_tau`` of
    the strongest are scaled down toward ``aniso_floor``."""
    w = m.plane_valid.astype(jnp.float32)
    Gw = (m.normal * w[:, None]).T @ m.normal  # (3,3) normal coverage
    Gb = R_c.T @ Gw @ R_c
    s = jnp.diag(Gb)
    s_rel = s / jnp.maximum(jnp.max(s), 1e-6)
    return jnp.clip(s_rel / cfg.aniso_tau, cfg.aniso_floor, 1.0).astype(
        jnp.float32
    )
