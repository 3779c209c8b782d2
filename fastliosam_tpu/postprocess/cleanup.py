"""Map cleanup: denoise, ground extraction, clustering, bounding boxes.

Capability ports of `post_process/clustering.py` (Open3D SOR denoise,
RANSAC ground plane, DBSCAN/Euclidean clustering, AABBs) and
`post_process/filter.py` (intensity filter), rebuilt on numpy + voxel
hashing (no Open3D in this environment; the math is the same).
"""
from __future__ import annotations

import numpy as np


def _knn_mean_dists(xyz: np.ndarray, k: int, chunk: int = 2048) -> np.ndarray:
    """Mean distance to k nearest neighbors, chunked brute force."""
    n = len(xyz)
    out = np.empty(n)
    for s in range(0, n, chunk):
        d2 = ((xyz[s : s + chunk, None] - xyz[None]) ** 2).sum(-1)
        np.fill_diagonal(d2[:, s : s + chunk], np.inf)
        part = np.partition(d2, k, axis=1)[:, :k]
        out[s : s + chunk] = np.sqrt(np.maximum(part, 0)).mean(1)
    return out


def sor_denoise(xyz: np.ndarray, nb_neighbors: int = 20, std_ratio: float = 2.0):
    """Statistical outlier removal (pcl::StatisticalOutlierRemoval /
    open3d remove_statistical_outlier semantics). Returns a keep-mask."""
    d = _knn_mean_dists(np.asarray(xyz, np.float64), nb_neighbors)
    thr = d.mean() + std_ratio * d.std()
    return d <= thr


def ransac_ground_plane(
    xyz: np.ndarray,
    distance_threshold: float = 0.2,
    num_iterations: int = 200,
    seed: int = 0,
):
    """RANSAC plane fit. Returns ``(plane (4,) [a,b,c,d], inlier_mask)``
    with the normal oriented +z (ground)."""
    rng = np.random.default_rng(seed)
    pts = np.asarray(xyz, np.float64)
    n = len(pts)
    best_count, best_plane = -1, None
    for _ in range(num_iterations):
        i = rng.choice(n, 3, replace=False)
        p0, p1, p2 = pts[i]
        nrm = np.cross(p1 - p0, p2 - p0)
        norm = np.linalg.norm(nrm)
        if norm < 1e-9:
            continue
        nrm = nrm / norm
        d = -nrm @ p0
        dist = np.abs(pts @ nrm + d)
        count = int((dist < distance_threshold).sum())
        if count > best_count:
            best_count, best_plane = count, (nrm, d)
    nrm, d = best_plane
    if nrm[2] < 0:
        nrm, d = -nrm, -d
    inliers = np.abs(pts @ nrm + d) < distance_threshold
    # least-squares refinement on inliers
    q = pts[inliers]
    centroid = q.mean(0)
    _, _, Vt = np.linalg.svd(q - centroid, full_matrices=False)
    nrm = Vt[-1]
    if nrm[2] < 0:
        nrm = -nrm
    d = -nrm @ centroid
    inliers = np.abs(pts @ nrm + d) < distance_threshold
    return np.array([*nrm, d]), inliers


def euclidean_clusters(
    xyz: np.ndarray, eps: float = 0.5, min_points: int = 10
) -> np.ndarray:
    """Density clustering via voxel-grid connected components (DBSCAN-like:
    points within ``eps`` connect transitively). Returns labels (N,),
    −1 = noise."""
    pts = np.asarray(xyz, np.float64)
    n = len(pts)
    cell = eps
    ij = np.floor(pts / cell).astype(np.int64)
    # map voxel -> point ids
    _, inv, counts = np.unique(
        ij, axis=0, return_inverse=True, return_counts=True
    )
    # union-find over points via voxel adjacency (27-stencil)
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    voxel_key = {}
    for idx in range(n):
        voxel_key.setdefault(tuple(ij[idx]), []).append(idx)
    offsets = [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ]
    eps2 = eps * eps
    for key, ids in voxel_key.items():
        base = ids[0]
        for other in ids[1:]:
            union(base, other)
        for off in offsets:
            nb = (key[0] + off[0], key[1] + off[1], key[2] + off[2])
            if nb <= key or nb not in voxel_key:
                continue
            nb_ids = voxel_key[nb]
            # connect if any cross-pair within eps
            d2 = ((pts[ids][:, None] - pts[nb_ids][None]) ** 2).sum(-1)
            if (d2 <= eps2).any():
                union(ids[0], nb_ids[0])
    roots = np.array([find(i) for i in range(n)])
    labels = -np.ones(n, dtype=int)
    next_label = 0
    for r in np.unique(roots):
        members = roots == r
        if members.sum() >= min_points:
            labels[members] = next_label
            next_label += 1
    return labels


def cluster_bounding_boxes(xyz: np.ndarray, labels: np.ndarray):
    """Axis-aligned bounding boxes per cluster: list of (min_xyz, max_xyz,
    n_points)."""
    out = []
    for lbl in range(labels.max() + 1):
        m = labels == lbl
        p = np.asarray(xyz)[m]
        out.append((p.min(0), p.max(0), int(m.sum())))
    return out


def intensity_filter(intensity: np.ndarray, min_intensity: float) -> np.ndarray:
    """Keep-mask for points above an intensity floor
    (`post_process/filter.py` capability)."""
    return np.asarray(intensity) >= min_intensity


def denoise_slam_map(
    xyz: np.ndarray,
    intensity: np.ndarray | None = None,
    min_intensity: float = 0.0,
    sor_neighbors: int = 20,
    sor_std: float = 2.0,
    cluster_eps: float = 0.0,
    cluster_min_points: int = 10,
) -> np.ndarray:
    """The reference's (disabled) map-denoise pipeline
    (`fast_lio_sam.cpp:941-1008`): optional intensity gate → statistical
    outlier removal → optional small-cluster rejection. Returns a keep-mask.
    """
    keep = np.ones(len(xyz), bool)
    if intensity is not None and min_intensity > 0:
        keep &= intensity_filter(intensity, min_intensity)
    idx = np.nonzero(keep)[0]
    sor_keep = sor_denoise(np.asarray(xyz)[idx], sor_neighbors, sor_std)
    keep[idx[~sor_keep]] = False
    if cluster_eps > 0:
        idx = np.nonzero(keep)[0]
        labels = euclidean_clusters(
            np.asarray(xyz)[idx], eps=cluster_eps, min_points=cluster_min_points
        )
        keep[idx[labels < 0]] = False
    return keep
