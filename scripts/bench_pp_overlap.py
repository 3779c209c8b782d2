#!/usr/bin/env python
"""Pipeline-parallel overlap measurement (VERDICT r1 #10): how much loop-ICP
verification latency is hidden by dispatching it to a second device
(`EngineConfig.loop_device`) while odometry keeps running on device 0.

Microbench over the real engine programs: a stream of odometry chunks with a
verification launched every chunk, measured with verification (a) on the
odometry device and (b) on device 1. JAX's async dispatch provides the
overlap; the measurement is end-to-end wall time.

Usage: python scripts/bench_pp_overlap.py --cpu 2    # 2 virtual devices
       python scripts/bench_pp_overlap.py            # real multi-chip
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, "out", "jaxcache")
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", type=int, default=0,
                    help="force CPU with N virtual devices")
    ap.add_argument("--n-chunks", type=int, default=12)
    ap.add_argument("--chunk", type=int, default=5)
    ap.add_argument("--pts", type=int, default=4096)
    ap.add_argument("--submap", type=int, default=8192)
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu}"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from fastliosam_tpu.loop import LoopConfig, verify_loop
    from fastliosam_tpu.map import VoxelMapConfig
    from fastliosam_tpu.odom import ImuBatch, OdomConfig, Scan, init_odom
    from fastliosam_tpu.odom.pipeline import odom_rollout

    assert len(jax.devices()) >= 2, "need >= 2 devices"

    # --- odometry chunk program on device 0 ---
    map_cfg = VoxelMapConfig(capacity=1 << 16, voxel_size=0.4, min_points=4)
    odom_cfg = OdomConfig(point_filter_num=1, blind=0.5, filter_size_surf=0.3,
                          num_ds_points=2048, det_range=100.0,
                          evict_every=10_000)
    rng = np.random.default_rng(0)
    S, N = args.chunk, args.pts
    xyz = rng.uniform(-20, 20, size=(S, N, 3)).astype(np.float32)
    xyz[..., 2] = np.abs(xyz[..., 2]) * 0.1
    scans = Scan(
        xyz=jnp.asarray(xyz),
        t_offset=jnp.zeros((S, N), jnp.float32),
        mask=jnp.ones((S, N), bool),
    )
    imus = ImuBatch(
        stamps=jnp.full((S, 8), 1e9, jnp.float32),
        gyro=jnp.zeros((S, 8, 3), jnp.float32),
        acc=jnp.zeros((S, 8, 3), jnp.float32),
        mask=jnp.zeros((S, 8), bool),
    )
    dt = jnp.float32(0.1)
    roll = jax.jit(
        lambda st: odom_rollout(st, scans, imus, dt, odom_cfg, map_cfg)[0]
    )

    # --- verification program, compiled per device ---
    loop_cfg = LoopConfig(num_submap_keyframes=2, submap_points=args.submap,
                          max_iterations=30, nn_chunk=1024)
    K, P = 8, args.submap // 2
    kf_clouds = jnp.asarray(
        rng.uniform(-15, 15, size=(K, P, 3)).astype(np.float32)
    )
    kf_masks = jnp.ones((K, P), bool)
    poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K, 4, 4))
    valid = jnp.ones((K,), bool)

    def make_verify(device):
        return jax.jit(
            lambda cl, mk: verify_loop(cl, mk, poses, valid,
                                       jnp.int32(7), jnp.int32(0), loop_cfg),
            device=device,
        )

    def run(verify, n_chunks):
        st = init_odom(map_cfg, odom_cfg)
        st = roll(st)  # warm state
        jax.block_until_ready(st.nav.p)
        t0 = time.perf_counter()
        outs = []
        for _ in range(n_chunks):
            st = roll(st)  # dispatch odometry (async)
            outs.append(verify(kf_clouds, kf_masks))  # dispatch verify
            # host reads only the previous verify flag, like the engine
            if len(outs) > 1:
                bool(outs[-2][2])
        jax.block_until_ready((st.nav.p, outs[-1][2]))
        return time.perf_counter() - t0

    v0 = make_verify(jax.devices()[0])
    v1 = make_verify(jax.devices()[1])
    # compile both + odometry
    run(v0, 2)
    run(v1, 2)

    t_same = min(run(v0, args.n_chunks) for _ in range(3))
    t_split = min(run(v1, args.n_chunks) for _ in range(3))

    # isolate the stage costs
    st = init_odom(map_cfg, odom_cfg)
    st = roll(st)
    jax.block_until_ready(st.nav.p)
    t0 = time.perf_counter()
    for _ in range(args.n_chunks):
        st = roll(st)
    jax.block_until_ready(st.nav.p)
    t_odom = time.perf_counter() - t0

    hidden = (t_same - t_split) / max(t_same - t_odom, 1e-9)
    print(json.dumps({
        "metric": "pp_loop_overlap",
        "backend": jax.default_backend(),
        "n_chunks": args.n_chunks,
        "odom_only_s": round(t_odom, 3),
        "same_device_s": round(t_same, 3),
        "split_device_s": round(t_split, 3),
        "verify_cost_hidden_frac": round(hidden, 3),
        "speedup": round(t_same / t_split, 3),
    }))


if __name__ == "__main__":
    main()
