#!/usr/bin/env python
"""Fine-grained timing of the odometry step's sub-stages at step shapes
(8k downsampled points) to target layout optimizations."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from fastliosam_tpu.core.pointcloud import Cloud, voxel_downsample
from fastliosam_tpu.map import VoxelMapConfig, insert, make_map
from fastliosam_tpu.map.voxel_hash import (
    _find_slots,
    _hash,
    _fingerprint,
    _voxel_coords,
    query_planes_merged3,
)
from fastliosam_tpu.odom import ImuBatch, OdomConfig
from fastliosam_tpu.odom.imu import propagate, deskew
from fastliosam_tpu.odom.state import init_state

N = 32768
NDS = 8192
rng = np.random.default_rng(0)
map_cfg = VoxelMapConfig(capacity=1 << 19, voxel_size=0.5, min_points=5)
odom_cfg = OdomConfig(point_filter_num=1, num_ds_points=NDS)

pts32 = jnp.asarray(rng.uniform(-60, 60, size=(N, 3)).astype(np.float32))
pts = pts32[:NDS]
mask = jnp.ones((NDS,), bool)
mask32 = jnp.ones((N,), bool)

m = make_map(map_cfg)
m, _ = insert(m, map_cfg, pts32, mask32, refresh_planes=False)
jax.block_until_ready(m)


def bench(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:34s} {dt:8.3f} ms")
    return dt


print("backend:", jax.default_backend())

bench("insert 8k (no refresh)",
      jax.jit(lambda m, p: insert(m, map_cfg, p, mask, refresh_planes=False)), m, pts)
bench("query merged3 8k",
      jax.jit(lambda m, p: query_planes_merged3(m, map_cfg, p, mask)), m, pts)
bench("find_slots 8k (4 probes)",
      jax.jit(lambda m, p: _find_slots(m, map_cfg, _voxel_coords(p, 0.5), mask)),
      m, pts)
bench("hash+fp only 8k",
      jax.jit(lambda p: (_hash(_voxel_coords(p, 0.5), map_cfg.capacity),
                         _fingerprint(_voxel_coords(p, 0.5)))), pts)

# isolated scatter / gather costs at step shapes
mom = m.moments
idx = jnp.asarray(rng.integers(0, map_cfg.capacity, size=(NDS,), dtype=np.int32))
upd = jnp.ones((NDS, 10), jnp.float32)
bench("scatter-add (8k,10)", jax.jit(lambda t, i, u: t.at[i].add(u)), mom, idx, upd)
bench("scatter-max (8k,) int", jax.jit(
    lambda i: jnp.zeros((map_cfg.capacity,), jnp.int32).at[i].max(
        jnp.arange(NDS, dtype=jnp.int32))), idx)
bench("gather (8k,10)", jax.jit(lambda t, i: t[i].sum()), mom, idx)
bench("gather (8k,) int", jax.jit(lambda t, i: t[i].sum()), m.fp, idx)

bench("voxel_downsample 32k", jax.jit(
    lambda p: voxel_downsample(Cloud(p, mask32), 0.5)), pts32)
bench("sort 32k u32", jax.jit(
    lambda k: jnp.sort(k)), jnp.asarray(rng.integers(0, 1 << 31, size=(N,), dtype=np.int32)))

state = init_state(None, odom_cfg)
imu = ImuBatch(
    stamps=jnp.asarray(np.linspace(0, 0.1, 32, endpoint=False, dtype=np.float32)),
    gyro=jnp.zeros((32, 3)),
    acc=jnp.asarray(np.tile([0, 0, 9.81], (32, 1)), jnp.float32),
    mask=jnp.ones((32,), bool),
)
bench("propagate (32 imu)", jax.jit(
    lambda s, im: propagate(s, im, odom_cfg, 0.1)), state, imu)
nav_prop, traj = propagate(state, imu, odom_cfg, 0.1)
toff = jnp.asarray(np.linspace(0, 0.1, N, endpoint=False, dtype=np.float32))
bench("deskew 32k", jax.jit(
    lambda x, t: deskew(x, t, mask32, traj, nav_prop, odom_cfg,
                        imu.mask, 0.1)), pts32, toff)
