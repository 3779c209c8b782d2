#!/usr/bin/env python
"""Honest per-stage attribution of the odometry step.

Each stage runs R times inside ONE `lax.scan` dispatch with a data
dependence between iterations (so neither the relay's result cache nor XLA
constant folding can elide work), and the per-iteration time is
(total - dispatch_baseline) / R. This is the measurement DESIGN.md §2b
demands; per-dispatch timing on the relay measures ~2.8 ms of fixed
round-trip overhead regardless of program.

Usage: python scripts/profile_step2.py [stage ...]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), "out", "jaxcache"))

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastliosam_tpu.core.pointcloud import Cloud, voxel_downsample
from fastliosam_tpu.core.eigh3 import smallest_eigvec3
from fastliosam_tpu.map import VoxelMapConfig, insert, make_map
from fastliosam_tpu.map.voxel_hash import (
    _find_slots, query_planes_merged3, evict_far,
)
from fastliosam_tpu.odom import ImuBatch, OdomConfig, init_odom, odom_step, Scan
from fastliosam_tpu.odom.imu import deskew, propagate
from fastliosam_tpu.odom.iekf import iekf_update

N = 32768
NDS = 8192
R = 24
rng = np.random.default_rng(0)
map_cfg = VoxelMapConfig(capacity=1 << 19, voxel_size=0.5, min_points=5)
odom_cfg = OdomConfig(point_filter_num=1, num_ds_points=NDS,
                      evict_every=10_000, query_mode="merged3",
                      filter_size_surf=0.5, det_range=150.0, blind=1.0)

# plane-world-like points: a floor + walls + boxes sampled on surfaces gives
# realistic voxel occupancy (uniform-random points yield near-empty voxels)
ang = rng.uniform(0, 2 * np.pi, N)
r_ = rng.uniform(2, 55, N)
pts_np = np.stack([r_ * np.cos(ang), r_ * np.sin(ang),
                   np.abs(np.sin(ang * 7)) * 4.0], 1).astype(np.float32)
pts = jnp.asarray(pts_np)
pts_ds = pts[:NDS]
mask = jnp.ones((N,), bool)
mask_ds = jnp.ones((NDS,), bool)

m0 = make_map(map_cfg)
m0, _ = insert(m0, map_cfg, pts, mask)
state0 = init_odom(map_cfg)
state0 = state0._replace(vmap=m0, initialized=jnp.ones((), bool))
imu = ImuBatch(
    stamps=jnp.asarray(np.linspace(0, 0.1, 32, endpoint=False,
                                   dtype=np.float32)),
    gyro=jnp.zeros((32, 3)),
    acc=jnp.asarray(np.tile([0, 0, 9.81], (32, 1)), jnp.float32),
    mask=jnp.ones((32,), bool),
)
scan = Scan(xyz=pts, t_offset=jnp.zeros((N,)), mask=mask)


def scan_time(name, make_prog, reps=R):
    """make_prog returns (jitted_fn, args). fn must internally loop
    `reps` times with a data dependence. Prints (t_total - t0_baseline)/reps."""
    fn, args = make_prog()
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per = (best * 1000 - BASELINE) / reps
    print(f"{name:34s} {per:8.3f} ms/iter   (dispatch total "
          f"{best*1000:7.1f} ms)")
    return per


# dispatch baseline: a scan of R trivial iterations
def _baseline():
    def prog():
        def f(x):
            def body(c, _):
                return c * 1.000001, None
            y, _ = jax.lax.scan(body, x, None, length=R)
            return y
        return jax.jit(f), (jnp.float32(1.0),)
    fn, args = prog()
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1000


BASELINE = 0.0
BASELINE = _baseline()
print(f"backend: {jax.default_backend()}   dispatch baseline: "
      f"{BASELINE:.2f} ms   R={R}")

want = set(sys.argv[1:])


def on(name):
    return not want or name in want


# ---- full step ----
if on("step"):
    def prog_step():
        def f(st, scan, imu):
            def body(c, _):
                s2, aux = odom_step(c, scan, imu, 0.1, odom_cfg, map_cfg)
                return s2, aux["p"]
            s, ps = jax.lax.scan(body, st, None, length=R)
            return ps
        return jax.jit(f), (state0, scan, imu)
    scan_time("full odom_step", prog_step)

# ---- iekf_update (3 iters, merged3) ----
if on("iekf"):
    def prog_iekf():
        def f(st, p):
            def body(c, _):
                nav, nm = iekf_update(st.nav, c, mask_ds, st.vmap, map_cfg,
                                      odom_cfg)
                return c + nav.p * 1e-9, nm
            y, _ = jax.lax.scan(body, p, None, length=R)
            return y
        return jax.jit(f), (state0, pts_ds)
    scan_time("iekf_update (3it, merged3)", prog_iekf)

# ---- one association pass (merged3 query) ----
if on("query"):
    def prog_query():
        def f(st, p):
            def body(c, _):
                n, d, v, _cf = query_planes_merged3(
                    st.vmap, map_cfg, c, mask_ds)
                return c + n * 1e-9, d
            y, _ = jax.lax.scan(body, p, None, length=R)
            return y
        return jax.jit(f), (state0, pts_ds)
    scan_time("query merged3 (1 assoc pass)", prog_query)

# ---- probe only (3 stencil x 4 probes worth of finds) ----
if on("probe"):
    def prog_probe():
        def f(st, p):
            def body(c, _):
                coords = jnp.floor(c / map_cfg.voxel_size).astype(jnp.int32)
                acc = jnp.zeros_like(c)
                for k in range(3):
                    sl, found = _find_slots(st.vmap, map_cfg, coords + k, mask_ds)
                    acc = acc + sl[:, None] * 1e-12
                return c + acc * 1e-9, None
            y, _ = jax.lax.scan(body, p, None, length=R)
            return y
        return jax.jit(f), (state0, pts_ds)
    scan_time("find_slots x3 (probe only)", prog_probe)

# ---- eigh3 on 8k cov matrices ----
if on("eigh"):
    def prog_eigh():
        covs = jnp.asarray(rng.normal(size=(NDS, 3, 3)).astype(np.float32))
        covs = covs @ jnp.swapaxes(covs, -1, -2)

        def f(cv):
            def body(c, _):
                n, lam = smallest_eigvec3(c)
                return c + n[:, :, None] * 1e-9, None
            y, _ = jax.lax.scan(body, cv, None, length=R)
            return y
        return jax.jit(f), (covs,)
    scan_time("smallest_eigvec3 (3x eigh/iter)",
              lambda: (lambda f, a: (f, a))(*prog_eigh()))

# ---- insert ----
if on("insert"):
    def prog_insert():
        def f(st, p):
            def body(c, _):
                m2, nd = insert(st.vmap, map_cfg, c, mask_ds,
                                refresh_planes=False)
                return c + m2.moments[0, :3] * 1e-12, nd
            y, _ = jax.lax.scan(body, p, None, length=R)
            return y
        return jax.jit(f), (state0, pts_ds)
    scan_time("insert 8k (refresh=False)", prog_insert)

# ---- voxel_downsample 32k ----
if on("ds"):
    def prog_ds():
        def f(p):
            def body(c, _):
                d = voxel_downsample(Cloud(c, mask), 0.5)
                return c + d.xyz[:N] * 1e-9, None
            y, _ = jax.lax.scan(body, p, None, length=R)
            return y
        return jax.jit(f), (pts,)
    scan_time("voxel_downsample 32k", prog_ds)

# ---- deskew + propagate ----
if on("imu"):
    def prog_imu():
        def f(st, sc):
            def body(c, _):
                nav, traj = propagate(st.nav, imu, odom_cfg, 0.1)
                pb = deskew(sc.xyz + c * 1e-9, sc.t_offset, sc.mask, traj,
                            nav, odom_cfg, imu.mask, 0.1)
                return c + pb[0] * 1e-9, None
            y, _ = jax.lax.scan(body, jnp.zeros((3,)), None, length=R)
            return y
        return jax.jit(f), (state0, scan)
    scan_time("propagate + deskew 32k", prog_imu)

# ---- evict ----
if on("evict"):
    def prog_evict():
        def f(st):
            def body(c, _):
                m2 = evict_far(st.vmap, map_cfg, c, 150.0)
                return c + m2.moments[0, :3] * 1e-12, None
            y, _ = jax.lax.scan(body, jnp.zeros((3,)), None, length=R)
            return y
        return jax.jit(f), (state0,)
    scan_time("evict_far", prog_evict)
