"""Device-resident incremental voxel-surfel hash map.

The TPU-native replacement for the reference's ikd-Tree map inside FAST-LIO2
(SURVEY.md §3.6) and for PCL KdTreeFLANN radius searches
(`fast_lio_sam.cpp:280,616,652,958`). Instead of a mutable tree with kNN
queries, the map is an open-addressing hash table of voxels, each voxel
accumulating Gaussian surfel statistics (count, first and second moments
relative to the voxel center). Point-to-plane matching reads a per-voxel
cached plane (normal, offset) — the analog of FAST-LIO's 5-NN plane fit —
or fits a plane on the fly from moments merged over a face-neighbor stencil.

Performance design (measured on TPU v5e): small-op dispatch/bandwidth
overhead dominates, not FLOPs, so the layout minimizes the number of
gather/scatter ops per probe round:

  * identity checks use a single int32 **fingerprint** word per slot (a
    second spatial hash, forced odd so 0 means empty) — one gather per
    probe instead of occupied + 3-word coords;
  * full integer coords are still stored (written once per voxel by the
    claim winner) for eviction and map export;
  * probe windows are short (defaults 8 insert / 4 query) and the load
    factor is kept low by sizing ``capacity`` ≥ 4× the live voxel count.

A fingerprint collision inside one probe window would merge two far-apart
voxels' statistics; with a 31-bit fingerprint and ≤8-slot windows the
probability is ~2⁻²⁸ per insert batch — negligible against LiDAR noise.

Everything is static-shape, batched, and in-place-updatable under ``jit``
with donated buffers. Moments are stored relative to each voxel's center so
float32 never suffers catastrophic cancellation at large world coordinates.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.eigh3 import smallest_eigvec3

_P1, _P2, _P3 = 73856093, 19349669, 83492791
_Q1, _Q2, _Q3 = 2654435761, 805459861, 3674653429  # fingerprint hash

# NOTE on hashing: combining signed products with XOR is unsound — for odd
# multipliers, -u == ~u ^ 1, so (-u) ^ (-v) == u ^ v exactly and every
# sign-flipped coordinate pair collides. Both hashes therefore combine
# additively in uint32 and run a murmur3-style avalanche finalizer.


def _mix32(h):
    """Avalanche finalizer (murmur3 fmix variant) on uint32."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> jnp.uint32(15))
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> jnp.uint32(16))
    return h


class VoxelMapConfig(NamedTuple):
    capacity: int = 1 << 20  # hash slots (power of two, keep load < 0.25)
    voxel_size: float = 0.5  # FAST-LIO ``filter_size_map`` analog
    # probe windows: claims only ever land at offsets < claim_probes, so the
    # insert match-scan and query windows need exactly claim_probes rounds —
    # larger windows buy nothing but gather traffic
    insert_probes: int = 4  # match-scan window during insert
    claim_probes: int = 4  # claim rounds for new voxels (collision retries)
    query_probes: int = 4  # probe rounds during query
    min_points: int = 5  # NUM_MATCH_POINTS analog for a valid plane
    plane_var_thresh: float = 0.01  # max variance along normal (0.1 m sigma)
    # isotropic noise floor (m²) added to the surfel scatter when
    # propagating fit uncertainty into the residual weight (~(1 cm)² LiDAR
    # noise): with a noise-free simulator a single grazing-incidence ring
    # crossing a voxel has zero scatter off the line, and the fitted
    # normal — arbitrary within the plane ⊥ the line — would otherwise
    # look exact. See ``_fit_rvar``.
    fit_noise_floor: float = 1e-4
    max_points_per_voxel: float = 1000.0  # moment saturation cap


class VoxelMap(NamedTuple):
    """SoA hash table. All arrays have leading dim = capacity.

    Moment statistics live in ONE fused ``(C, 10)`` array —
    ``[count, Σ(p-c) (3), Σ outer (6)]`` — so the query/insert hot paths
    pay a single gather/scatter per slot instead of three (HBM gather
    traffic is the dominant cost of the plane-association kernels)."""

    fp: jnp.ndarray  # (C,) int32 fingerprint; 0 = empty, else odd
    coords: jnp.ndarray  # (C, 3) int32 voxel integer coords (0 when empty)
    moments: jnp.ndarray  # (C, 10) float32 [count, psum(3), pouter(6)]
    normal: jnp.ndarray  # (C, 3) float32 cached plane normal
    d: jnp.ndarray  # (C,) float32 cached plane offset: n·x + d = 0
    plane_valid: jnp.ndarray  # (C,) int32 0/1

    @property
    def occupied(self):
        return (self.fp != 0).astype(jnp.int32)

    # convenience views (not hot-path: hot code gathers `moments` directly)
    @property
    def count(self):
        return self.moments[:, 0]

    @property
    def psum(self):
        return self.moments[:, 1:4]

    @property
    def pouter(self):
        return self.moments[:, 4:10]


def make_map(cfg: VoxelMapConfig) -> VoxelMap:
    c = cfg.capacity
    assert c & (c - 1) == 0, "capacity must be a power of two"
    return VoxelMap(
        fp=jnp.zeros((c,), jnp.int32),
        coords=jnp.zeros((c, 3), jnp.int32),
        moments=jnp.zeros((c, 10), jnp.float32),
        normal=jnp.zeros((c, 3), jnp.float32),
        d=jnp.zeros((c,), jnp.float32),
        plane_valid=jnp.zeros((c,), jnp.int32),
    )


def _voxel_coords(xyz, voxel_size):
    return jnp.floor(xyz / voxel_size).astype(jnp.int32)


def _hash(coords, capacity):
    c = coords.astype(jnp.uint32)
    h = (
        c[..., 0] * jnp.uint32(_P1)
        + c[..., 1] * jnp.uint32(_P2)
        + c[..., 2] * jnp.uint32(_P3)
    )
    return (_mix32(h) & jnp.uint32(capacity - 1)).astype(jnp.int32)


def _fingerprint(coords):
    """Odd (hence nonzero) int32 identity word per voxel coordinate."""
    c = coords.astype(jnp.uint32)
    h = (
        c[..., 0] * jnp.uint32(_Q1)
        + c[..., 1] * jnp.uint32(_Q2)
        + c[..., 2] * jnp.uint32(_Q3)
    )
    h = _mix32(h) | jnp.uint32(1)
    return jax.lax.bitcast_convert_type(h, jnp.int32)


def _voxel_center(coords, voxel_size):
    return (coords.astype(jnp.float32) + 0.5) * voxel_size


def _outer6(v):
    """Upper-triangle outer product packing (..., 3) -> (..., 6)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([x * x, x * y, x * z, y * y, y * z, z * z], axis=-1)


def _unpack_sym(m6):
    """(..., 6) -> (..., 3, 3) symmetric."""
    xx, xy, xz, yy, yz, zz = (m6[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def _find_slots(m: VoxelMap, cfg: VoxelMapConfig, coords, mask, probes=None):
    """Probe for existing slots (query path): one fingerprint gather per
    round. Returns (slots, found)."""
    cap = cfg.capacity
    h0 = _hash(coords, cap)
    want = _fingerprint(coords)
    slots = jnp.full(coords.shape[:-1], -1, jnp.int32)
    for p in range(probes or cfg.query_probes):
        cand = (h0 + p) & (cap - 1)
        match = m.fp[cand] == want
        slots = jnp.where((slots < 0) & match & mask, cand, slots)
    return slots, slots >= 0


def insert(m: VoxelMap, cfg: VoxelMapConfig, xyz, mask, refresh_planes=True):
    """Insert a (masked) batch of world-frame points.

    Returns ``(map, n_dropped)`` where ``n_dropped`` counts points that
    exhausted all probe rounds (hash table too full / pathological
    clustering) and were skipped. ``refresh_planes=False`` skips the cached
    per-voxel plane refit — valid when all queries use the merged-moment
    path, which reads raw moments instead of cached planes.

    Probing is a fused match-or-claim loop: each round gathers the
    fingerprints once and either adopts an existing entry or claims an empty
    slot (scatter-max tournament; same-voxel losers adopt the winner's
    committed entry on the re-check). This costs one fp gather per round
    instead of the round-2 two-phase layout's separate match scan —
    measured ~1.2 ms/scan cheaper at 8k points on TPU v5e. Caveat: after
    :func:`evict_far` punches holes in a probe chain, a re-inserted voxel
    may claim a hole ahead of its surviving older entry; queries then see
    the fresh (shadowing) entry and the stale one wastes one slot until
    evicted — bounded by the eviction rate, and exactly why ``capacity``
    keeps load < 0.25.
    """
    cap = cfg.capacity
    coords = _voxel_coords(xyz, cfg.voxel_size)
    h0 = _hash(coords, cap)
    want = _fingerprint(coords)
    n = xyz.shape[0]
    pid = jnp.arange(n, dtype=jnp.int32)

    fp = m.fp
    slots = jnp.full((n,), -1, jnp.int32)
    poff = jnp.zeros((n,), jnp.int32)
    won_slot = jnp.full((n,), cap, jnp.int32)  # out-of-bounds = no win
    for _ in range(max(cfg.insert_probes, cfg.claim_probes)):
        cand = (h0 + poff) & (cap - 1)
        unassigned = (slots < 0) & mask
        cur = fp[cand]
        # adopt an existing entry for this voxel
        slots = jnp.where(unassigned & (cur == want), cand, slots)
        # claim an empty slot (tournament: highest pid wins the scatter-max)
        tryclaim = unassigned & (cur == 0)
        claim = jnp.zeros((cap,), jnp.int32).at[cand].max(
            jnp.where(tryclaim, pid + 1, 0), mode="drop"
        )
        won = tryclaim & (claim[cand] == pid + 1)
        # commit winners; empty slots hold fp == 0 so a scatter-add writes
        # exactly the winner's identity
        fp = fp.at[cand].add(want * won.astype(jnp.int32), mode="drop")
        won_slot = jnp.where(won, cand, won_slot)
        # re-check after commits: winners and same-voxel losers both match now
        cur2 = fp[cand]
        slots = jnp.where((slots < 0) & mask & (cur2 == want), cand, slots)
        # true collisions advance to the next probe offset
        poff = jnp.where(
            (slots < 0) & mask & (cur2 != 0) & (cur2 != want), poff + 1, poff
        )
    coords_tbl = m.coords.at[won_slot].set(coords, mode="drop", unique_indices=True)

    assigned = (slots >= 0) & mask
    n_dropped = jnp.sum(mask & ~assigned, dtype=jnp.int32)
    sl = jnp.where(assigned, slots, cap)  # out-of-bounds -> dropped scatter

    # moment saturation: stop accumulating once a voxel is very full so
    # float32 sums stay accurate and stale geometry can't dominate forever
    room = m.moments[jnp.clip(sl, 0, cap - 1), 0] < cfg.max_points_per_voxel
    w = (assigned & room).astype(jnp.float32)

    rel = xyz - _voxel_center(coords, cfg.voxel_size)
    upd = jnp.concatenate(
        [jnp.ones_like(w)[:, None], rel, _outer6(rel)], axis=-1
    ) * w[:, None]  # (N, 10) fused moment update, one scatter
    moments = m.moments.at[sl].add(upd, mode="drop")

    m = m._replace(fp=fp, coords=coords_tbl, moments=moments)

    if refresh_planes:
        # refresh cached planes for touched slots (duplicates write
        # identical values, so the scatter is deterministic)
        nrm, dd, pv = _fit_planes(m, cfg, sl)
        m = m._replace(
            normal=m.normal.at[sl].set(nrm, mode="drop"),
            d=m.d.at[sl].set(dd, mode="drop"),
            plane_valid=m.plane_valid.at[sl].set(pv, mode="drop"),
        )
    return m, n_dropped


def _fit_planes(m: VoxelMap, cfg: VoxelMapConfig, slots):
    """Fit planes from the moments stored at ``slots`` (clipped gather)."""
    sl = jnp.clip(slots, 0, cfg.capacity - 1)
    mom = m.moments[sl]  # one fused gather
    c = mom[:, 0]
    safe_c = jnp.maximum(c, 1.0)
    mean_rel = mom[:, 1:4] / safe_c[:, None]
    cov = _unpack_sym(mom[:, 4:10]) / safe_c[:, None, None] - (
        mean_rel[:, :, None] * mean_rel[:, None, :]
    )
    normal, lam = smallest_eigvec3(cov)
    center = _voxel_center(m.coords[sl], cfg.voxel_size)
    mean_world = center + mean_rel
    d = -jnp.sum(normal * mean_world, axis=-1)
    valid = (c >= cfg.min_points) & (lam[..., 0] < cfg.plane_var_thresh)
    return normal, d, valid.astype(jnp.int32)


def _fit_rvar(xyz, mean_world, cov, normal, lam, tot_c, cfg):
    """Per-query residual-variance inflation from surfel-fit uncertainty.

    A plane fitted to c points with scatter eigenvalues λ₀≤λ₁≤λ₂ has
    offset variance ≈ λ₀/c and normal-rotation variances ≈ λ₀/(c·λᵢ)
    toward the in-plane directions vᵢ. A query point offset tᵢ = vᵢ·(q−μ)
    along those directions therefore sees residual variance

        rvar ≈ (λ₀/c) · (1 + t₁²/λ₁ + t₂²/λ₂)
             = (λ₀/c) · (1 + (q−μ)ᵀ Σ⁻¹ (q−μ) − t₀²/λ₀)

    (no eigenvectors needed — the in-plane Mahalanobis form). This is what
    separates trustworthy from garbage associations in degenerate
    geometry: a near-collinear fit (single elevation ring crossing a
    voxel, λ₁ ≈ noise²) is still fully weighted for queries ON the
    sampled line, but strongly attenuated for queries between rings —
    where its arbitrary normal would otherwise drag the estimate (the r3
    canyon CV-mode velocity collapse). Unlike the r3 hard mid-eigenvalue
    gate this keeps the ~1/3 of sparse-feed matches whose ring-overlap
    queries are sound (the gate cost 4× ATE on the room bench — r4 bisect
    of VERDICT r3 weak #2). λ and Σ are floored by
    ``cfg.fit_noise_floor`` (the sim is noise-free; real LiDAR is ~1 cm).
    """
    eps = cfg.fit_noise_floor
    # in-plane query offset: project the normal component out FIRST — the
    # algebraically equivalent `full_maha − t0²/λ₀` subtracts two large
    # near-equal numbers for near-degenerate fits and is numerically
    # chaotic (eager-vs-jit rounding produced 100x relative swings)
    rq = xyz - mean_world
    t0 = jnp.sum(normal * rq, axis=-1)
    rp = rq - t0[..., None] * normal
    # closed-form symmetric 3x3 solve via the adjugate (batched
    # jnp.linalg.solve lowers to a generic LU path on TPU — measured ~5x
    # the whole odometry step): Σ⁻¹r = adj(Σ)r / det(Σ), all elementwise
    a = cov[..., 0, 0] + eps
    b = cov[..., 0, 1]
    c = cov[..., 0, 2]
    d = cov[..., 1, 1] + eps
    e = cov[..., 1, 2]
    f = cov[..., 2, 2] + eps
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = jnp.maximum(a * A + b * B + c * C, 1e-18)
    x, y, z = rp[..., 0], rp[..., 1], rp[..., 2]
    sx = A * x + B * y + C * z
    sy = B * x + (a * f - c * c) * y + (b * c - a * e) * z
    sz = C * x + (b * c - a * e) * y + (a * d - b * b) * z
    inplane = jnp.maximum((x * sx + y * sy + z * sz) / det, 0.0)
    lam0 = jnp.maximum(lam[..., 0], 0.0)
    return (lam0 + eps) / jnp.maximum(tot_c, 1.0) * (1.0 + inplane)


def query_planes(m: VoxelMap, cfg: VoxelMapConfig, xyz, mask):
    """Per-point cached plane lookup in the point's own voxel.

    Returns ``(normal (N,3), d (N,), valid (N,) bool)``. The fast path of
    point-to-plane matching (FAST-LIO 5-NN plane fit analog).
    """
    coords = _voxel_coords(xyz, cfg.voxel_size)
    slots, found = _find_slots(m, cfg, coords, mask)
    sl = jnp.clip(slots, 0, cfg.capacity - 1)
    normal = m.normal[sl]
    d = m.d[sl]
    valid = found & (m.plane_valid[sl] > 0) & mask
    return normal, d, valid


# numpy (NOT jnp): a module-level device array would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize() for
# any multi-host program importing this package first
_STENCIL7 = np.array(
    [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
    dtype=np.int32,
)


def query_planes_merged(m: VoxelMap, cfg: VoxelMapConfig, xyz, mask):
    """Plane fit from moments merged over the 7-voxel face stencil.

    Closer to the reference's kNN behavior at voxel boundaries: moments of
    the center voxel and its six face neighbors are re-referenced to the
    center voxel's frame and combined, then a single plane is fit per query
    point. More gather traffic than :func:`query_planes` but far more
    robust for sparse/boundary geometry.
    """
    coords0 = _voxel_coords(xyz, cfg.voxel_size)
    n = xyz.shape[0]
    c0 = _voxel_center(coords0, cfg.voxel_size)

    tot_c = jnp.zeros((n,), jnp.float32)
    tot_s = jnp.zeros((n, 3), jnp.float32)
    tot_o = jnp.zeros((n, 3, 3), jnp.float32)
    for k in range(7):
        coords = coords0 + _STENCIL7[k]
        slots, found = _find_slots(m, cfg, coords, mask)
        sl = jnp.clip(slots, 0, cfg.capacity - 1)
        mom = m.moments[sl] * found.astype(jnp.float32)[:, None]  # 1 gather
        ci = mom[:, 0]
        si = mom[:, 1:4]
        oi = _unpack_sym(mom[:, 4:10])
        # shift moments from neighbor center c_i to the query voxel center c0
        dc = _voxel_center(coords, cfg.voxel_size) - c0
        tot_c = tot_c + ci
        tot_s = tot_s + si + ci[:, None] * dc
        cross = si[:, :, None] * dc[:, None, :]
        tot_o = (
            tot_o
            + oi
            + cross
            + jnp.swapaxes(cross, -1, -2)
            + ci[:, None, None] * (dc[:, :, None] * dc[:, None, :])
        )

    safe_c = jnp.maximum(tot_c, 1.0)
    mean = tot_s / safe_c[:, None]
    cov = tot_o / safe_c[:, None, None] - mean[:, :, None] * mean[:, None, :]
    normal, lam = smallest_eigvec3(cov)
    mean_world = c0 + mean
    d = -jnp.sum(normal * mean_world, axis=-1)
    valid = (
        mask
        & (tot_c >= cfg.min_points)
        & (lam[..., 0] < cfg.plane_var_thresh)
    )
    rvar = _fit_rvar(xyz, mean_world, cov, normal, lam, tot_c, cfg)
    return normal, d, valid, rvar


def query_planes_merged2(m: VoxelMap, cfg: VoxelMapConfig, xyz, mask):
    """Plane fit from the query's own voxel merged with its single nearest
    face neighbor (chosen by the point's in-voxel offset).

    The cheap middle ground between :func:`query_planes` (1 voxel) and
    :func:`query_planes_merged` (7 voxels): captures the dominant
    boundary-straddling case at ~2/7 of the gather traffic.
    """
    coords0 = _voxel_coords(xyz, cfg.voxel_size)
    n = xyz.shape[0]
    c0 = _voxel_center(coords0, cfg.voxel_size)
    # dominant offset axis decides the neighbor
    off = xyz - c0  # in [-vs/2, vs/2]
    ax = jnp.argmax(jnp.abs(off), axis=-1)
    # scatter-free neighbor step: one-hot select of the dominant axis
    onehot = (jnp.arange(3)[None, :] == ax[:, None]).astype(jnp.int32)
    step = jnp.sign(jnp.sum(off * onehot, axis=-1)).astype(jnp.int32)
    nb = coords0 + step[:, None] * onehot

    tot_c = jnp.zeros((n,), jnp.float32)
    tot_s = jnp.zeros((n, 3), jnp.float32)
    tot_o = jnp.zeros((n, 3, 3), jnp.float32)
    for coords in (coords0, nb):
        slots, found = _find_slots(m, cfg, coords, mask)
        sl = jnp.clip(slots, 0, cfg.capacity - 1)
        mom = m.moments[sl] * found.astype(jnp.float32)[:, None]  # 1 gather
        ci = mom[:, 0]
        si = mom[:, 1:4]
        oi = _unpack_sym(mom[:, 4:10])
        dc = _voxel_center(coords, cfg.voxel_size) - c0
        tot_c = tot_c + ci
        tot_s = tot_s + si + ci[:, None] * dc
        cross = si[:, :, None] * dc[:, None, :]
        tot_o = (
            tot_o
            + oi
            + cross
            + jnp.swapaxes(cross, -1, -2)
            + ci[:, None, None] * (dc[:, :, None] * dc[:, None, :])
        )

    safe_c = jnp.maximum(tot_c, 1.0)
    mean = tot_s / safe_c[:, None]
    cov = tot_o / safe_c[:, None, None] - mean[:, :, None] * mean[:, None, :]
    normal, lam = smallest_eigvec3(cov)
    mean_world = c0 + mean
    d = -jnp.sum(normal * mean_world, axis=-1)
    valid = (
        mask
        & (tot_c >= cfg.min_points)
        & (lam[..., 0] < cfg.plane_var_thresh)
    )
    rvar = _fit_rvar(xyz, mean_world, cov, normal, lam, tot_c, cfg)
    return normal, d, valid, rvar


def query_planes_merged3(m: VoxelMap, cfg: VoxelMapConfig, xyz, mask):
    """Plane fit from the query's own voxel merged with its two dominant
    face neighbors (one per largest in-voxel offset axis).

    Middle ground between :func:`query_planes_merged2` (2 voxels) and the
    full 7-stencil :func:`query_planes_merged`: captures edge-straddling
    (two-axis) boundary cases at 3/7 of the gather traffic.
    """
    coords0 = _voxel_coords(xyz, cfg.voxel_size)
    n = xyz.shape[0]
    c0 = _voxel_center(coords0, cfg.voxel_size)
    off = xyz - c0  # in [-vs/2, vs/2]
    aoff = jnp.abs(off)
    ax1 = jnp.argmax(aoff, axis=-1)
    # scatter-free one-hot selects (device scatters by point index compile
    # and run far worse than elementwise selects, especially on CPU)
    oh1 = (jnp.arange(3)[None, :] == ax1[:, None]).astype(jnp.float32)
    # second-largest axis: mask out the winner and argmax again
    ax2 = jnp.argmax(aoff * (1.0 - oh1) - oh1, axis=-1)
    oh2 = (jnp.arange(3)[None, :] == ax2[:, None]).astype(jnp.float32)
    sgn = jnp.sign(off)
    nb1 = coords0 + (sgn * oh1).astype(jnp.int32)
    nb2 = coords0 + (sgn * oh2).astype(jnp.int32)

    tot_c = jnp.zeros((n,), jnp.float32)
    tot_s = jnp.zeros((n, 3), jnp.float32)
    tot_o = jnp.zeros((n, 3, 3), jnp.float32)
    for coords in (coords0, nb1, nb2):
        slots, found = _find_slots(m, cfg, coords, mask)
        sl = jnp.clip(slots, 0, cfg.capacity - 1)
        mom = m.moments[sl] * found.astype(jnp.float32)[:, None]  # 1 gather
        ci = mom[:, 0]
        si = mom[:, 1:4]
        oi = _unpack_sym(mom[:, 4:10])
        dc = _voxel_center(coords, cfg.voxel_size) - c0
        tot_c = tot_c + ci
        tot_s = tot_s + si + ci[:, None] * dc
        cross = si[:, :, None] * dc[:, None, :]
        tot_o = (
            tot_o
            + oi
            + cross
            + jnp.swapaxes(cross, -1, -2)
            + ci[:, None, None] * (dc[:, :, None] * dc[:, None, :])
        )

    safe_c = jnp.maximum(tot_c, 1.0)
    mean = tot_s / safe_c[:, None]
    cov = tot_o / safe_c[:, None, None] - mean[:, :, None] * mean[:, None, :]
    normal, lam = smallest_eigvec3(cov)
    mean_world = c0 + mean
    d = -jnp.sum(normal * mean_world, axis=-1)
    valid = (
        mask
        & (tot_c >= cfg.min_points)
        & (lam[..., 0] < cfg.plane_var_thresh)
    )
    rvar = _fit_rvar(xyz, mean_world, cov, normal, lam, tot_c, cfg)
    return normal, d, valid, rvar


def evict_far(m: VoxelMap, cfg: VoxelMapConfig, center_xyz, det_range):
    """Clear voxels farther than ``det_range`` from ``center_xyz`` (FoV
    sliding, FAST-LIO ``det_range``/``cube_side_length`` semantics)."""
    centers = _voxel_center(m.coords, cfg.voxel_size)
    dist2 = jnp.sum((centers - center_xyz) ** 2, axis=-1)
    keep = (m.fp != 0) & (dist2 < det_range * det_range)
    keepf = keep.astype(jnp.float32)
    keepi = keep.astype(jnp.int32)
    return m._replace(
        fp=m.fp * keepi,
        coords=m.coords * keepi[:, None],
        moments=m.moments * keepf[:, None],
        normal=m.normal * keepf[:, None],
        d=m.d * keepf,
        plane_valid=m.plane_valid * keepi,
    )


def occupied_centroids(m: VoxelMap, cfg: VoxelMapConfig):
    """Per-voxel mean points (world frame) + occupancy mask — a compact map
    snapshot for visualization/export."""
    safe_c = jnp.maximum(m.count, 1.0)
    mean_rel = m.psum / safe_c[:, None]
    centers = _voxel_center(m.coords, cfg.voxel_size)
    pts = centers + mean_rel
    occ = m.fp != 0
    return jnp.where(occ[:, None], pts, 1.0e6), occ
