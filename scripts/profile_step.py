"""Per-component timing of the odometry step on the current backend."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from fastliosam_tpu.core.pointcloud import Cloud, compact, voxel_downsample
from fastliosam_tpu.map import VoxelMapConfig, insert, make_map
from fastliosam_tpu.map.voxel_hash import query_planes_merged, query_planes
from fastliosam_tpu.odom import ImuBatch, OdomConfig, init_odom, odom_step, Scan
from fastliosam_tpu.odom.imu import propagate, deskew
from fastliosam_tpu.odom.iekf import iekf_update

N = 32768
NDS = 8192
rng = np.random.default_rng(0)
map_cfg = VoxelMapConfig(capacity=1 << 19, voxel_size=0.5, min_points=5)
odom_cfg = OdomConfig(point_filter_num=1, num_ds_points=NDS, evict_every=10_000)

pts = jnp.asarray(rng.uniform(-60, 60, size=(N, 3)).astype(np.float32))
pts_ds = pts[:NDS]
mask = jnp.ones((N,), bool)
mask_ds = jnp.ones((NDS,), bool)

m = make_map(map_cfg)
m, _ = insert(m, map_cfg, pts, mask)
state = init_odom(map_cfg)
imu = ImuBatch(
    stamps=jnp.asarray(np.linspace(0, 0.1, 32, endpoint=False, dtype=np.float32)),
    gyro=jnp.zeros((32, 3)), acc=jnp.asarray(np.tile([0, 0, 9.81], (32, 1)), jnp.float32),
    mask=jnp.ones((32,), bool),
)
scan = Scan(xyz=pts, t_offset=jnp.zeros((N,)), mask=mask)


def bench(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:28s} {dt:8.2f} ms")
    return dt


print("backend:", jax.default_backend())
bench("full odom_step", jax.jit(lambda s, sc, im: odom_step(s, sc, im, 0.1, odom_cfg, map_cfg)), state, scan, imu)
bench("map insert 32k", jax.jit(lambda m, p: insert(m, map_cfg, p, mask)), m, pts)
bench("query merged 8k", jax.jit(lambda m, p: query_planes_merged(m, map_cfg, p, mask_ds)), m, pts_ds)
bench("query cached 8k", jax.jit(lambda m, p: query_planes(m, map_cfg, p, mask_ds)), m, pts_ds)
bench("voxel_downsample 32k", jax.jit(lambda p: voxel_downsample(Cloud(p, mask), 0.5)), pts)
bench("compact 32k", jax.jit(lambda p: compact(Cloud(p, mask))), pts)
bench("imu propagate", jax.jit(lambda s, im: propagate(s.nav, im, odom_cfg, 0.1)), state, imu)
bench("iekf_update (3 it)", jax.jit(lambda s, p, m_: iekf_update(s.nav, p, mask_ds, m_, map_cfg, odom_cfg)), state, pts_ds, m)
