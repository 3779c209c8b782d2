#!/usr/bin/env python
"""r5 probes: (1) measured per-keyframe-hop odometry drift on the fig-8
feed — the honest basis for the degraded-GPS bench's odometry
between-factor noise model; (2) the no-init transient profile — where the
0.10 m ATE actually accrues (first-scans transient vs steady drift)."""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def probe_per_hop():
    """Drive the fig-8 pipeline engine (sync), then compare each keyframe
    hop's raw-odometry translation against ground truth."""
    pipe, engine, feed, pdata = bench.bench_pipeline()
    raw = np.stack(engine.raw_traj)[:, :3, 3]
    gt = pdata["gt_p"][: len(raw)]
    st = np.asarray(engine.scan_stamps)
    n = engine.kf.n
    kf_st = np.asarray(engine.kf.stamps[:n], np.float64)
    idx = np.clip(np.searchsorted(st, kf_st), 0, len(st) - 1)
    hop_est = np.diff(raw[idx], axis=0)
    hop_gt = np.diff(gt[idx], axis=0)
    err = np.linalg.norm(hop_est - hop_gt, axis=1)
    out = {
        "n_hops": int(len(err)),
        "hop_err_med_m": round(float(np.median(err)), 5),
        "hop_err_p90_m": round(float(np.percentile(err, 90)), 5),
        "hop_err_max_m": round(float(np.max(err)), 5),
        "hop_len_med_m": round(
            float(np.median(np.linalg.norm(hop_gt, axis=1))), 3),
    }
    print(json.dumps(out), flush=True)


def probe_no_init():
    data = bench.get_sequence()
    _, _, _, _, _, ctx = bench.bench_odometry(data)
    roll, scans, imus = ctx["roll"], ctx["scans"], ctx["imus"]
    R0, p0 = data["R0"], data["p0"]
    gt_local = (data["gt_p"][: ctx["S"]] - p0) @ R0
    st, aux = roll(ctx["identity_state"](), scans, imus)
    ps = np.asarray(aux["p"])
    err = np.linalg.norm(ps - gt_local, axis=1)
    out = {
        "per_scan_err": [round(float(e), 4) for e in err],
        "ate_all": round(float(np.sqrt(np.mean(err ** 2))), 4),
        "ate_skip5": round(float(np.sqrt(np.mean(err[5:] ** 2))), 4),
        "ate_skip10": round(float(np.sqrt(np.mean(err[10:] ** 2))), 4),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "hop"):
        probe_per_hop()
    if which in ("both", "noinit"):
        probe_no_init()
