#!/usr/bin/env python
"""Attribute the pipeline-vs-odometry throughput gap (VERDICT r2 #2).

Runs the bench fig-8 feed through the chunked engine three ways:

  full       — keyframes + fused loop detect + ICP verify + PGO solves
  no_verify  — keyframes committed, loop verification suppressed
  no_kf      — keyframe threshold at infinity: pure chunked odometry

and prints per-variant wall time + scans/s. ``full - no_verify`` is the
loop-ICP + solve cost, ``no_verify - no_kf`` the keyframe-commit cost
(downsample + graph append inside the chunk program), and ``no_kf`` vs the
plain `odom_rollout` number is the chunking/dispatch overhead.

Usage: python scripts/profile_pipeline.py [--chunk 5] [--reps 3]
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import bench

    data = bench._cached(bench.PIPE_CACHE, bench.build_fig8_sequence)
    import jax.numpy as jnp

    from fastliosam_tpu.odom import ImuBatch, Scan

    engine = bench.make_engine_for(data, chunk=args.chunk)
    xyz, toff, mask = bench.pad_scans(data)
    S = xyz.shape[0]
    stamps_all = np.asarray(data["stamps"], np.float64)
    dt = float(data["scan_dt"])
    feed = []
    for c in range(0, S - (S % args.chunk), args.chunk):
        sl = slice(c, c + args.chunk)
        scans = Scan(xyz=jnp.asarray(xyz[sl]), t_offset=jnp.asarray(toff[sl]),
                     mask=jnp.asarray(mask[sl]))
        imus = ImuBatch(
            stamps=jnp.asarray(data["imu_t"][sl]),
            gyro=jnp.asarray(data["imu_g"][sl]),
            acc=jnp.asarray(data["imu_a"][sl]),
            mask=jnp.asarray(data["imu_m"][sl]),
        )
        feed.append((scans, imus, stamps_all[sl], dt,
                     float(stamps_all[sl][0]) - dt, float(stamps_all[sl][-1])))
    n_fed = len(feed) * args.chunk

    # keyframe_threshold is baked into the chunk program at trace time:
    # the no_kf variant needs its OWN warmed engine (r4 fix — the r3
    # harness silently measured the full config, and rebuilding programs
    # inside the timing loop measures retrace, not the pipeline)
    engine_nokf = bench.make_engine_for(data, chunk=args.chunk)
    engine_nokf.cfg = engine_nokf.cfg._replace(keyframe_threshold=1e9)
    engine_nokf._build_programs()

    def run(variant, deferred=False):
        e = engine_nokf if variant == "no_kf" else engine
        bench._init_engine_at(e, data)
        if variant == "no_verify":
            e._loop_processed_kf = 1 << 30
        step = (e.process_chunk_deferred if deferred
                else e.process_chunk)
        t0 = time.perf_counter()
        for (scans, imus, stamps, sdt, lo, hi) in feed:
            step(scans, imus, stamps, sdt)
            if variant == "no_verify":
                e._loop_processed_kf = 1 << 30
        e.finish()
        el = time.perf_counter() - t0
        stats = (e.kf.n, len(e.loop_pairs), e.solve_count)
        return el, stats

    out = {}
    for variant, deferred in (
        ("full", False), ("full_deferred", True), ("no_verify", False),
        ("no_kf", False),
    ):
        v = variant.replace("_deferred", "")
        run(v, deferred)  # warm/compile
        el, stats = min(run(v, deferred) for _ in range(args.reps))
        out[variant] = {
            "wall_s": round(el, 3),
            "scans_per_sec": round(n_fed / el, 2),
            "kf_loops_solves": stats,
        }
        print(f"# {variant}: {out[variant]}", file=sys.stderr)

    full, nv, nk = (out[v]["wall_s"] for v in ("full", "no_verify", "no_kf"))
    out["attribution_s"] = {
        "verify_plus_solve": round(full - nv, 3),
        "keyframe_commit": round(nv - nk, 3),
        "chunked_odom": round(nk, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
