#!/usr/bin/env python
"""Speed-of-light accounting for the odometry step (VERDICT r1 #6).

Uses XLA's compiled cost analysis (flops + bytes accessed) for one
`odom_step` at bench shapes, measures the achieved step time, and compares
against the chip's HBM-bandwidth and MXU rooflines. Prints one JSON line.

TPU v5e (v5 lite) peaks used: 819 GB/s HBM, 197 TFLOP/s bf16,
~49 TFLOP/s f32 (the geometry path runs f32 via the highest-precision
matmul policy — see fastliosam_tpu/utils/precision.py).
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

PEAKS = {
    # chip: (hbm_bytes_per_s, f32_flops, bf16_flops)
    "tpu_v5e": (819e9, 49e12, 197e12),
    "cpu": (50e9, 1e12, 1e12),  # ballpark, for relative numbers only
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--raw-pts", type=int, default=32768)
    ap.add_argument("--num-ds", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--chip", default="tpu_v5e", choices=sorted(PEAKS))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from fastliosam_tpu.odom import ImuBatch, Scan
    from fastliosam_tpu.odom.pipeline import odom_step

    data = B.get_sequence()
    ctx = B.make_rollout(data, raw_pts=args.raw_pts, num_ds=args.num_ds)
    odom_cfg, map_cfg = ctx["odom_cfg"], ctx["map_cfg"]
    dt = jnp.float32(data["scan_dt"])

    step = jax.jit(
        lambda st, scan, imu: odom_step(st, scan, imu, dt, odom_cfg, map_cfg),
        donate_argnums=(0,),
    )
    scan0 = jax.tree.map(lambda x: x[0], ctx["scans"])
    imu0 = jax.tree.map(lambda x: x[0], ctx["imus"])

    lowered = step.lower(ctx["gt_state"](), scan0, imu0)
    compiled = lowered.compile()
    ca = compiled.cost_analysis() or {}
    flops = float(ca.get("flops", 0.0))
    raw_bytes = float(ca.get("bytes accessed", 0.0))
    # XLA's "bytes accessed" counts operand+output of every HLO, including
    # VMEM-resident intermediate reuse; the HBM-true lower bound is the
    # graph's input+output footprint per step (state is donated/aliased).
    io_bytes = sum(
        np.prod(s.shape) * s.dtype.itemsize
        for s in jax.tree.leaves(
            jax.eval_shape(lambda st, sc, im: step(st, sc, im),
                           ctx["gt_state"](), scan0, imu0)
        )
        if hasattr(s, "shape")
    ) + sum(
        np.prod(x.shape) * x.dtype.itemsize
        for x in jax.tree.leaves((scan0, imu0))
    )

    # measure: run a warm state forward repeatedly (state donated)
    st = ctx["gt_state"]()
    st, aux = step(st, scan0, imu0)
    jax.block_until_ready(aux["p"])
    t0 = time.perf_counter()
    for _ in range(args.reps):
        st, aux = step(st, scan0, imu0)
    jax.block_until_ready(aux["p"])
    t_step = (time.perf_counter() - t0) / args.reps

    hbm_bw, f32_fl, _ = PEAKS[args.chip]
    t_flops = flops / f32_fl
    t_hbm_xla = raw_bytes / hbm_bw
    t_hbm_io = io_bytes / hbm_bw
    bound = "flops" if t_flops > t_hbm_xla else "memory"
    sol = max(t_flops, t_hbm_io)
    print(json.dumps({
        "metric": "odom_step_roofline",
        "backend": jax.default_backend(),
        "raw_pts": args.raw_pts,
        "num_ds_points": args.num_ds,
        "flops_per_step": flops,
        "xla_bytes_accessed": raw_bytes,
        "io_bytes_per_step": float(io_bytes),
        "measured_ms": round(t_step * 1e3, 3),
        "roofline_flops_ms": round(t_flops * 1e3, 3),
        "roofline_xla_bytes_ms": round(t_hbm_xla * 1e3, 3),
        "roofline_io_bytes_ms": round(t_hbm_io * 1e3, 3),
        "bound": bound,
        "pct_of_xla_bytes_roofline": round(100 * t_hbm_xla / t_step, 1),
        "speed_of_light_ms": round(sol * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
