"""Data-parallel batched rollout: two sequences in one vmapped dispatch
must match the two individual rollouts."""
import numpy as np
import jax
import jax.numpy as jnp

from fastliosam_tpu.eval.batch_eval import batched_rollout, stack_states
from fastliosam_tpu.odom import ImuBatch, Scan, init_odom
from fastliosam_tpu.odom.pipeline import odom_rollout
from fastliosam_tpu.sim import PlaneWorld, SimConfig, Trajectory, simulate_sequence
from tests.test_rollout import MAP_CFG, ODOM_CFG


def build_seq(seed):
    world = PlaneWorld.room(size=24.0, height=5.0, n_boxes=5, seed=seed)
    traj = Trajectory.circle(radius=8.0, period=40.0)
    cfg = SimConfig(n_azimuth=128, n_elev=8, seed=seed)
    data = simulate_sequence(world, traj, cfg, n_scans=4)
    cap = 32
    scans = Scan(
        xyz=jnp.asarray(np.stack([s[0] for s in data["scans"]])),
        t_offset=jnp.asarray(np.stack([s[1] for s in data["scans"]])),
        mask=jnp.asarray(np.stack([s[2] for s in data["scans"]])),
    )
    def pad_imu(b):
        ts, gy, ac = b
        n = len(ts)
        return (
            np.pad(ts, (0, cap - n), constant_values=1e9),
            np.pad(gy, ((0, cap - n), (0, 0))),
            np.pad(ac, ((0, cap - n), (0, 0))),
            np.arange(cap) < n,
        )
    imus_np = [pad_imu(b) for b in data["imu"]]
    imus = ImuBatch(
        stamps=jnp.asarray(np.stack([i[0] for i in imus_np])),
        gyro=jnp.asarray(np.stack([i[1] for i in imus_np])),
        acc=jnp.asarray(np.stack([i[2] for i in imus_np])),
        mask=jnp.asarray(np.stack([i[3] for i in imus_np])),
    )
    R0, p0 = traj.pose(0.0)
    st = init_odom(MAP_CFG)
    st = st._replace(
        nav=st.nav._replace(
            R=jnp.asarray(R0, jnp.float32), p=jnp.asarray(p0, jnp.float32),
            v=jnp.asarray(traj.velocity(0.0), jnp.float32),
        )
    )
    return st, scans, imus, data["scan_dt"]


def test_batched_matches_individual():
    st1, sc1, im1, dt = build_seq(1)
    st2, sc2, im2, _ = build_seq(7)

    roll = jax.jit(lambda s, sc, im: odom_rollout(s, sc, im, dt, ODOM_CFG, MAP_CFG))
    _, aux1 = roll(st1, sc1, im1)
    _, aux2 = roll(st2, sc2, im2)

    states = stack_states([st1, st2])
    scans = jax.tree.map(lambda a, b: jnp.stack([a, b]), sc1, sc2)
    imus = jax.tree.map(lambda a, b: jnp.stack([a, b]), im1, im2)
    _, auxb = batched_rollout(states, scans, imus, dt, ODOM_CFG, MAP_CFG)

    np.testing.assert_allclose(
        np.asarray(auxb["p"][0]), np.asarray(aux1["p"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(auxb["p"][1]), np.asarray(aux2["p"]), atol=1e-4
    )
