"""Slot-range sharding of the voxel-surfel hash map (SURVEY §2.3 SP row:
"shard keyframe poses + map voxel blocks across a device mesh").

Partition: the hash-slot axis is split contiguously — device d owns slots
[d·C/n, (d+1)·C/n). Points are replicated; each device resolves only the
probe candidates that land in its slot range and the per-point results are
combined with one small collective per phase:

* probe resolution — each device computes its local "first matching probe
  offset" and a ``pmin`` picks the global one (probe windows may cross
  shard boundaries, so ownership is per-candidate, not per-point);
* moment fetch — the owning device contributes the (N, 10) fused moment
  rows, combined with one ``psum`` per stencil position;
* insert — claim tournaments and moment scatter-adds are local to the
  owning device (a slot has exactly one owner, so the round-2 scatter-max
  race resolution needs no cross-device coordination); per probe round the
  shared fingerprint view costs one ``psum``.

The memory win is the point (each device holds C/n slots — the ~7 km
MulRan-Riverside regime, BASELINE.md config #5); the collectives are
O(N · 10) floats per association pass, independent of map size. Equivalence
with the replicated map is tested on the 8-virtual-device mesh
(`tests/test_parallel.py`).

Reference pain point being scaled: the unbounded single-host ikd-Tree map
inside FAST-LIO (SURVEY §3.6) and `fast_lio_sam.cpp:787-790` map growth.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..map.voxel_hash import (
    VoxelMap,
    VoxelMapConfig,
    _fingerprint,
    _hash,
    _outer6,
    _unpack_sym,
    _voxel_center,
    _voxel_coords,
    make_map,
)
from ..core.eigh3 import smallest_eigvec3
from ..map.voxel_hash import _fit_rvar

_NO_MATCH = 127  # probe-offset sentinel (> any real probe window)


def make_map_sharded(cfg: VoxelMapConfig, mesh: Mesh, axis: str = "kf"):
    """Create an empty map whose arrays are sharded along the slot axis."""
    m = make_map(cfg)
    spec = lambda *s: NamedSharding(mesh, P(*s))  # noqa: E731
    return VoxelMap(
        fp=jax.device_put(m.fp, spec(axis)),
        coords=jax.device_put(m.coords, spec(axis, None)),
        moments=jax.device_put(m.moments, spec(axis, None)),
        normal=jax.device_put(m.normal, spec(axis, None)),
        d=jax.device_put(m.d, spec(axis)),
        plane_valid=jax.device_put(m.plane_valid, spec(axis)),
    )


def _owned(cand, lo, Kl):
    own = (cand >= lo) & (cand < lo + Kl)
    li = jnp.clip(cand - lo, 0, Kl - 1)
    return own, li


def _find_probe_offsets(fp_l, lo, Kl, h0, want, mask, probes, cap, axis):
    """Global first-matching probe offset per point (or _NO_MATCH)."""
    best = jnp.full(h0.shape, _NO_MATCH, jnp.int32)
    for p in range(probes):
        cand = (h0 + p) & (cap - 1)
        own, li = _owned(cand, lo, Kl)
        hit = own & mask & (fp_l[li] == want)
        best = jnp.minimum(best, jnp.where(hit, p, _NO_MATCH))
    return jax.lax.pmin(best, axis)


def query_planes_merged3_sharded(
    m: VoxelMap, cfg: VoxelMapConfig, xyz, mask, mesh: Mesh, axis: str = "kf"
):
    """Sharded-map equivalent of `voxel_hash.query_planes_merged3`:
    replicated points, slot-sharded tables, replicated
    (normal, d, valid, rvar)."""
    return _query_prog(cfg, mesh, axis)(m.fp, m.moments, xyz, mask)


@lru_cache(maxsize=None)
def _query_prog(cfg: VoxelMapConfig, mesh: Mesh, axis: str):
    """Jitted + cached per (cfg, mesh, axis): building the shard_map
    closure fresh per call re-traced AND re-compiled every invocation
    (measured 55 s per un-jitted eager call on the 8-virtual-device CPU
    mesh — the bulk of the r3 suite's 18-minute wall time)."""
    cap = cfg.capacity
    n_dev = mesh.shape[axis]
    assert cap % n_dev == 0
    Kl = cap // n_dev

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis, None), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def f(fp_l, mom_l, pts, msk):
        lo = jax.lax.axis_index(axis) * Kl
        coords0 = _voxel_coords(pts, cfg.voxel_size)
        n = pts.shape[0]
        c0 = _voxel_center(coords0, cfg.voxel_size)
        off = pts - c0
        aoff = jnp.abs(off)
        ax1 = jnp.argmax(aoff, axis=-1)
        oh1 = (jnp.arange(3)[None, :] == ax1[:, None]).astype(jnp.float32)
        ax2 = jnp.argmax(aoff * (1.0 - oh1) - oh1, axis=-1)
        oh2 = (jnp.arange(3)[None, :] == ax2[:, None]).astype(jnp.float32)
        sgn = jnp.sign(off)
        stencil = (
            coords0,
            coords0 + (sgn * oh1).astype(jnp.int32),
            coords0 + (sgn * oh2).astype(jnp.int32),
        )

        tot_c = jnp.zeros((n,), jnp.float32)
        tot_s = jnp.zeros((n, 3), jnp.float32)
        tot_o = jnp.zeros((n, 3, 3), jnp.float32)
        for coords in stencil:
            h0 = _hash(coords, cap)
            want = _fingerprint(coords)
            poff = _find_probe_offsets(
                fp_l, lo, Kl, h0, want, msk, cfg.query_probes, cap, axis
            )
            found = poff < _NO_MATCH
            slot = (h0 + jnp.where(found, poff, 0)) & (cap - 1)
            own, li = _owned(slot, lo, Kl)
            contrib = jnp.where(
                (own & found)[:, None], mom_l[li], 0.0
            )
            mom = jax.lax.psum(contrib, axis)  # (N, 10), one collective
            ci = mom[:, 0]
            si = mom[:, 1:4]
            oi = _unpack_sym(mom[:, 4:10])
            dc = _voxel_center(coords, cfg.voxel_size) - c0
            tot_c = tot_c + ci
            tot_s = tot_s + si + ci[:, None] * dc
            cross = si[:, :, None] * dc[:, None, :]
            tot_o = (
                tot_o + oi + cross + jnp.swapaxes(cross, -1, -2)
                + ci[:, None, None] * (dc[:, :, None] * dc[:, None, :])
            )

        safe_c = jnp.maximum(tot_c, 1.0)
        mean = tot_s / safe_c[:, None]
        cov = tot_o / safe_c[:, None, None] - mean[:, :, None] * mean[:, None, :]
        normal, lam = smallest_eigvec3(cov)
        mean_world = c0 + mean
        d = -jnp.sum(normal * mean_world, axis=-1)
        valid = (
            msk
            & (tot_c >= cfg.min_points)
            & (lam[..., 0] < cfg.plane_var_thresh)
        )
        return normal, d, valid, _fit_rvar(
            pts, mean_world, cov, normal, lam, tot_c, cfg)

    return f


def insert_sharded(
    m: VoxelMap, cfg: VoxelMapConfig, xyz, mask, mesh: Mesh, axis: str = "kf"
):
    """Sharded-map equivalent of `voxel_hash.insert` (fused match-or-claim
    probing; plane cache not refreshed — merged-moment queries only).
    Returns ``(map, n_dropped)`` with tables still sharded."""
    fp, coords, moments, n_drop = _insert_prog(cfg, mesh, axis)(
        m.fp, m.coords, m.moments, xyz, mask
    )
    return (
        m._replace(fp=fp, coords=coords, moments=moments),
        n_drop[0] if n_drop.ndim else n_drop,
    )


@lru_cache(maxsize=None)
def _insert_prog(cfg: VoxelMapConfig, mesh: Mesh, axis: str):
    """Jitted + cached per (cfg, mesh, axis) — see `_query_prog`."""
    cap = cfg.capacity
    n_dev = mesh.shape[axis]
    assert cap % n_dev == 0
    Kl = cap // n_dev

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis, None), P(axis, None), P(), P()),
        out_specs=(P(axis), P(axis, None), P(axis, None), P()),
        check_vma=False,
    )
    def f(fp_l, coords_l, mom_l, pts, msk):
        lo = jax.lax.axis_index(axis) * Kl
        coords = _voxel_coords(pts, cfg.voxel_size)
        h0 = _hash(coords, cap)
        want = _fingerprint(coords)
        n = pts.shape[0]
        pid = jnp.arange(n, dtype=jnp.int32)

        slots = jnp.full((n,), -1, jnp.int32)
        poff = jnp.zeros((n,), jnp.int32)
        won_local = jnp.full((n,), Kl, jnp.int32)  # local OOB = no win here
        for _ in range(max(cfg.insert_probes, cfg.claim_probes)):
            cand = (h0 + poff) & (cap - 1)
            own, li = _owned(cand, lo, Kl)
            unassigned = (slots < 0) & msk
            # shared fingerprint view of the candidates (one psum)
            cur = jax.lax.psum(
                jnp.where(own, fp_l[li], 0), axis
            )
            slots = jnp.where(unassigned & (cur == want), cand, slots)
            tryclaim = unassigned & (cur == 0)
            # local tournament on owned candidates only
            tl = tryclaim & own
            claim = jnp.zeros((Kl,), jnp.int32).at[
                jnp.where(tl, li, Kl)
            ].max(jnp.where(tl, pid + 1, 0), mode="drop")
            won_l = tl & (claim[li] == pid + 1)
            fp_l = fp_l.at[jnp.where(won_l, li, Kl)].add(
                want * won_l.astype(jnp.int32), mode="drop"
            )
            won_local = jnp.where(won_l, li, won_local)
            cur2 = jax.lax.psum(jnp.where(own, fp_l[li], 0), axis)
            slots = jnp.where((slots < 0) & msk & (cur2 == want), cand, slots)
            poff = jnp.where(
                (slots < 0) & msk & (cur2 != 0) & (cur2 != want),
                poff + 1, poff,
            )
        coords_l = coords_l.at[won_local].set(
            coords, mode="drop", unique_indices=True
        )

        assigned = (slots >= 0) & msk
        n_dropped = jax.lax.psum(
            jnp.sum((msk & ~assigned).astype(jnp.int32)), axis
        ) // n_dev  # every device computes the same count
        own, li = _owned(jnp.where(assigned, slots, cap + lo), lo, Kl)
        sl = jnp.where(own & assigned, li, Kl)  # local OOB -> dropped
        room = mom_l[jnp.clip(sl, 0, Kl - 1), 0] < cfg.max_points_per_voxel
        w = (own & assigned & room).astype(jnp.float32)
        rel = pts - _voxel_center(coords, cfg.voxel_size)
        upd = jnp.concatenate(
            [jnp.ones_like(w)[:, None], rel, _outer6(rel)], axis=-1
        ) * w[:, None]
        mom_l = mom_l.at[sl].add(upd, mode="drop")
        return fp_l, coords_l, mom_l, n_dropped

    return f
