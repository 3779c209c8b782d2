#!/usr/bin/env python
"""Dense-vs-PCG crossover for the pose-graph solve (VERDICT r1 #4):
sweep keyframe counts, time both linear stages, and report where the dense
MXU-backed Cholesky stops beating matrix-free PCG — the data behind
PoseGraphConfig.linear_solver="auto"'s threshold.

Usage (TPU):  python scripts/bench_pgo_crossover.py
       (CPU): python scripts/bench_pgo_crossover.py --cpu 1
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "out", "jaxcache"),
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[512, 1024, 2048, 4096])
    ap.add_argument("--pcg-iters", type=int, default=96)
    ap.add_argument("--lm-iters", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", type=int, default=0)
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from fastliosam_tpu.pgo import PoseGraphConfig, solve
    from bench_scaling import build_graph

    rows = []
    for K in args.sizes:
        row = {"keyframes": K}
        for mode in ("dense", "pcg"):
            cfg = PoseGraphConfig(
                max_keyframes=K, max_between=2 * K, max_gps=8,
                lm_iters=args.lm_iters, pcg_iters=args.pcg_iters,
                linear_solver=mode,
            )
            g = build_graph(cfg, K)
            f = jax.jit(lambda g, cfg=cfg: solve(g, cfg))
            try:
                g2, cost = f(g)
                cost.block_until_ready()
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    g2, cost = f(g)
                    cost.block_until_ready()
                ms = (time.perf_counter() - t0) / args.reps * 1e3
                row[f"{mode}_ms"] = round(ms, 2)
                row[f"{mode}_cost"] = round(float(cost), 4)
            except Exception as e:  # OOM at large K on small chips
                row[f"{mode}_ms"] = None
                row[f"{mode}_error"] = str(e)[:120]
        if row.get("dense_ms") and row.get("pcg_ms"):
            row["dense_over_pcg"] = round(row["dense_ms"] / row["pcg_ms"], 3)
        rows.append(row)
        print(f"  K={K}: dense {row.get('dense_ms')} ms, "
              f"pcg {row.get('pcg_ms')} ms", file=sys.stderr)

    print(json.dumps({
        "metric": "pgo_dense_vs_pcg_crossover",
        "backend": jax.default_backend(),
        "lm_iters": args.lm_iters,
        "pcg_iters": args.pcg_iters,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
