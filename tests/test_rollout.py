"""odom_rollout (single-dispatch sequence) must match per-step odom_step."""
import numpy as np
import jax
import jax.numpy as jnp

from fastliosam_tpu.map import VoxelMapConfig
from fastliosam_tpu.odom import ImuBatch, OdomConfig, Scan, init_odom, odom_step
from fastliosam_tpu.odom.pipeline import odom_rollout
from fastliosam_tpu.sim import PlaneWorld, SimConfig, Trajectory, simulate_sequence
import pytest

pytestmark = pytest.mark.slow

MAP_CFG = VoxelMapConfig(capacity=1 << 14, voxel_size=0.5, min_points=4)
ODOM_CFG = OdomConfig(
    point_filter_num=1, blind=0.5, filter_size_surf=0.4, num_ds_points=1024,
    evict_every=10_000, max_imu_per_scan=32,
)


def test_rollout_matches_stepwise():
    world = PlaneWorld.room(size=24.0, height=5.0, n_boxes=6, seed=2)
    traj = Trajectory.circle(radius=8.0, period=40.0)
    cfg = SimConfig(
        n_azimuth=128, n_elev=8, gyro_bias=(0, 0, 0), acc_bias=(0, 0, 0),
        gyro_noise=0.0005, acc_noise=0.005, seed=5,
    )
    data = simulate_sequence(world, traj, cfg, n_scans=6)
    cap = 32

    def stack_imu(k):
        ts, gy, ac = data["imu"][k]
        n = len(ts)
        return (
            np.pad(ts, (0, cap - n), constant_values=1e9),
            np.pad(gy, ((0, cap - n), (0, 0))),
            np.pad(ac, ((0, cap - n), (0, 0))),
            np.arange(cap) < n,
        )

    imus = [stack_imu(k) for k in range(6)]
    scans_np = data["scans"]
    R0, p0 = traj.pose(0.0)

    def fresh():
        st = init_odom(MAP_CFG)
        return st._replace(
            nav=st.nav._replace(
                R=jnp.asarray(R0, jnp.float32), p=jnp.asarray(p0, jnp.float32),
                v=jnp.asarray(traj.velocity(0.0), jnp.float32),
            )
        )

    dt = jnp.float32(data["scan_dt"])
    # stepwise
    step = jax.jit(lambda s, sc, im: odom_step(s, sc, im, dt, ODOM_CFG, MAP_CFG))
    st = fresh()
    ps_step = []
    for k in range(6):
        sc = Scan(*[jnp.asarray(x) for x in scans_np[k]])
        im = ImuBatch(*[jnp.asarray(x) for x in imus[k]])
        st, aux = step(st, sc, im)
        ps_step.append(np.asarray(aux["p"]))
    # rolled
    scans = Scan(
        xyz=jnp.asarray(np.stack([s[0] for s in scans_np])),
        t_offset=jnp.asarray(np.stack([s[1] for s in scans_np])),
        mask=jnp.asarray(np.stack([s[2] for s in scans_np])),
    )
    imub = ImuBatch(
        stamps=jnp.asarray(np.stack([i[0] for i in imus])),
        gyro=jnp.asarray(np.stack([i[1] for i in imus])),
        acc=jnp.asarray(np.stack([i[2] for i in imus])),
        mask=jnp.asarray(np.stack([i[3] for i in imus])),
    )
    roll = jax.jit(lambda s, sc, im: odom_rollout(s, sc, im, dt, ODOM_CFG, MAP_CFG))
    st2, aux2 = roll(fresh(), scans, imub)
    ps_roll = np.asarray(aux2["p"])
    np.testing.assert_allclose(np.stack(ps_step), ps_roll, atol=1e-4)
