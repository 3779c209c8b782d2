"""Result export and checkpoint/resume.

Export parity with the reference's ``saveFlagCallback``
(`fast_lio_sam.cpp:805-939`): KITTI pose file, TUM trajectory, full
corrected map as binary PCD, and a per-keyframe bundle (the "map
checkpoint" consumed by the localization package, `config.yaml:21` — here
an .npz instead of a rosbag).

Checkpoint/resume goes beyond the reference (SURVEY.md §5 notes it has
none): the full engine state — nav state, voxel map, keyframe store,
factor graph, realtime-correction anchors — round-trips through one
compressed .npz so a mapping session can stop and continue exactly.
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from ..io.pcd import write_pcd
from ..io.poses import write_kitti_poses, write_tum_trajectory
from .engine import SlamEngine


def save_results(engine: SlamEngine, out_dir: str, seq_name: str = "seq",
                 map_voxel: float = 0.3) -> dict:
    """Write KITTI + TUM trajectories, the corrected global map PCD and the
    keyframe bundle. Returns the written paths."""
    os.makedirs(out_dir, exist_ok=True)
    engine.finish()
    paths = {}
    n = engine.kf.n
    kf_poses = engine.keyframe_poses()
    kf_stamps = engine.keyframe_stamps()

    p = os.path.join(out_dir, f"{seq_name}_kitti.txt")
    write_kitti_poses(p, kf_poses)
    paths["kitti"] = p

    p = os.path.join(out_dir, f"{seq_name}_tum.txt")
    write_tum_trajectory(p, kf_stamps, kf_poses)
    paths["tum"] = p

    p = os.path.join(out_dir, f"{seq_name}_scans_tum.txt")
    write_tum_trajectory(p, engine.scan_stamps, np.stack(engine.realtime_traj))
    paths["tum_scans"] = p

    pts = engine.assemble_map(voxel=map_voxel)
    p = os.path.join(out_dir, f"{seq_name}_map.pcd")
    write_pcd(p, pts.astype(np.float32))
    paths["map_pcd"] = p

    # 3D viewer (RViz-replacement visualization)
    from ..postprocess.viewer3d import write_map_viewer

    p = os.path.join(out_dir, f"{seq_name}_viewer.html")
    write_map_viewer(
        p, pts, trajectory=kf_poses[:, :3, 3], loop_pairs=engine.loop_pairs,
        title=seq_name,
    )
    paths["viewer"] = p

    # keyframe bundle (rosbag-of-keyframes analog for relocalization)
    p = os.path.join(out_dir, f"{seq_name}_keyframes.npz")
    np.savez_compressed(
        p,
        poses=kf_poses,
        stamps=kf_stamps,
        clouds=np.asarray(engine.kf.clouds[:n]),
        masks=np.asarray(engine.kf.masks[:n]),
    )
    paths["keyframes"] = p

    meta = {
        "n_keyframes": int(n),
        "n_scans": engine.scan_count,
        "n_loops": len(engine.loop_pairs),
        "n_gps_factors": int(engine.graph.n_gps),
        "loop_pairs": engine.loop_pairs,
    }
    p = os.path.join(out_dir, f"{seq_name}_meta.json")
    with open(p, "w") as f:
        json.dump(meta, f, indent=2)
    paths["meta"] = p
    return paths


def _tree_to_dict(prefix: str, tree) -> dict:
    out = {}
    for name, val in tree._asdict().items():
        key = f"{prefix}.{name}"
        if hasattr(val, "_asdict"):
            out.update(_tree_to_dict(key, val))
        else:
            out[key] = np.asarray(val)
    return out


def save_checkpoint(engine: SlamEngine, path: str) -> None:
    """Snapshot the complete engine state into one compressed npz."""
    blob = {}
    blob.update(_tree_to_dict("odom", engine.odom))
    blob.update(_tree_to_dict("graph", engine.graph))
    blob["kf.clouds"] = np.asarray(engine.kf.clouds)
    blob["kf.masks"] = np.asarray(engine.kf.masks)
    blob["kf.raw_poses"] = np.asarray(engine.kf.raw_poses)
    blob["kf.stamps"] = np.asarray(engine.kf.stamps)
    blob["kf.n"] = np.asarray(engine.kf.n)
    blob["rt.last_kf_raw"] = np.asarray(engine.last_kf_raw)
    blob["rt.last_kf_corrected"] = np.asarray(engine.last_kf_corrected)
    blob["rt.scan_count"] = np.asarray(engine.scan_count)
    blob["rt.traj_len"] = np.asarray(engine.traj_len)
    blob["rt.loop_pairs"] = np.asarray(engine.loop_pairs or np.zeros((0, 2), int))
    blob["rt.raw_traj"] = np.asarray(engine.raw_traj)
    blob["rt.realtime_traj"] = np.asarray(engine.realtime_traj)
    blob["rt.scan_stamps"] = np.asarray(engine.scan_stamps)
    blob["rt.solve_count"] = np.asarray(engine.solve_count)
    np.savez_compressed(path, **blob)


def _fill_tree(tree, blob, prefix):
    kwargs = {}
    for name, val in tree._asdict().items():
        key = f"{prefix}.{name}"
        if hasattr(val, "_asdict"):
            kwargs[name] = _fill_tree(val, blob, key)
        else:
            kwargs[name] = jnp.asarray(blob[key])
    return type(tree)(**kwargs)


def load_checkpoint(engine: SlamEngine, path: str) -> SlamEngine:
    """Restore a checkpoint into a freshly constructed engine (same
    configs). Returns the engine for chaining."""
    blob = np.load(path)
    engine.odom = _fill_tree(engine.odom, blob, "odom")
    engine.graph = _fill_tree(engine.graph, blob, "graph")
    engine.kf.clouds = jnp.asarray(blob["kf.clouds"])
    engine.kf.masks = jnp.asarray(blob["kf.masks"])
    engine.kf.raw_poses = jnp.asarray(blob["kf.raw_poses"])
    engine.kf.stamps = jnp.asarray(blob["kf.stamps"])
    engine.kf.n = int(blob["kf.n"])
    engine._kf_n_dev = None  # host counter is authoritative after a restore
    engine.last_kf_raw = jnp.asarray(blob["rt.last_kf_raw"])
    engine.last_kf_corrected = jnp.asarray(blob["rt.last_kf_corrected"])
    engine.scan_count = int(blob["rt.scan_count"])
    engine.traj_len = float(blob["rt.traj_len"])
    engine.loop_pairs = [tuple(p) for p in blob["rt.loop_pairs"]]
    engine.raw_traj = list(blob["rt.raw_traj"])
    engine.realtime_traj = list(blob["rt.realtime_traj"])
    engine.scan_stamps = list(blob["rt.scan_stamps"])
    engine.solve_count = int(blob["rt.solve_count"])
    if len(engine.raw_traj):
        # process() measures step distance in the raw odometry frame
        engine._last_p = np.asarray(engine.raw_traj[-1])[:3, 3]
    # derived host-side state: factor counters for the capacity policy,
    # loop dedup watermark, and capacities that may have grown before save
    engine._n_bt_host = int(engine.graph.n_bt)
    engine._n_gps_host = int(engine.graph.n_gps)
    engine._loop_processed_kf = max(engine.kf.n - 1, 0)
    engine.pgo_cfg = engine.pgo_cfg._replace(
        max_keyframes=int(engine.graph.poses.shape[0]),
        max_between=int(engine.graph.bt_i.shape[0]),
        max_gps=int(engine.graph.gps_idx.shape[0]),
    )
    return engine
