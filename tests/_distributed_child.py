"""Child process for the two-process jax.distributed test.

Run as: python tests/_distributed_child.py <coordinator> <nprocs> <pid>
Prints PROC_OK <pid> <device_count> <psum> <cost> on success.
"""
import os
import sys

coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

# must beat the first backend init (the container's sitecustomize forces the
# axon TPU platform; override exactly like tests/conftest.py does)
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastliosam_tpu.parallel import global_mesh, init_distributed  # noqa: E402

n_procs, my_id = init_distributed(
    coordinator=coordinator, num_processes=nprocs, process_id=pid
)
assert n_procs == nprocs, (n_procs, nprocs)
assert my_id == pid, (my_id, pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

mesh = global_mesh("kf")
n_dev = mesh.devices.size
assert n_dev == 2 * nprocs, n_dev

# host-major ordering: this process's local devices occupy the contiguous
# block [pid*2, pid*2+2) of the mesh
flat = list(mesh.devices.reshape(-1))
for i, d in enumerate(flat):
    if d.process_index == pid:
        assert i // 2 == pid, (i, pid)

# cross-host collective: psum over a sharded array
from functools import partial  # noqa: E402

@partial(
    jax.shard_map, mesh=mesh, in_specs=P("kf"), out_specs=P(), check_vma=False
)
def total(x):
    return jax.lax.psum(jnp.sum(x), "kf")

arr = jax.device_put(
    np.arange(n_dev * 4, dtype=np.float32),
    NamedSharding(mesh, P("kf")),
)
s = float(total(arr))
expect = float(np.arange(n_dev * 4).sum())
assert s == expect, (s, expect)

# distributed PGO solve across the processes
from fastliosam_tpu.core import se3  # noqa: E402
from fastliosam_tpu.parallel import solve_sharded  # noqa: E402
from fastliosam_tpu.pgo import PoseGraphConfig, from_arrays  # noqa: E402

K = 16
cfg = PoseGraphConfig(max_keyframes=K, max_between=2 * K, max_gps=4,
                      lm_iters=3, pcg_iters=32)
rng = np.random.default_rng(0)
poses = [np.eye(4, dtype=np.float32)]
rels = []
step = np.eye(4, dtype=np.float32)
step[0, 3] = 1.0
for _ in range(1, K):
    n = np.eye(4, dtype=np.float32)
    n[:3, 3] = rng.normal(size=3) * 0.05
    rel = step @ n
    poses.append(poses[-1] @ rel)
    rels.append(rel)
g = from_arrays(
    cfg, np.stack(poses), bt_i=np.arange(K - 1), bt_j=np.arange(1, K),
    bt_rel=np.stack(rels),
    bt_sqrt_info=np.tile(np.asarray([10.0] * 3 + [100.0] * 3, np.float32),
                         (K - 1, 1)),
)
g2, cost = solve_sharded(g, cfg, mesh)
cost = float(cost)
assert np.isfinite(cost)

print(f"PROC_OK {pid} {n_dev} {s} {cost:.6f}", flush=True)
