"""Road-network map matching: snap a georeferenced trajectory to roads.

Capability port of the reference's `georef_mapmatch.py` (mappymatch
LCSSMatcher over OSM): an HMM matcher — emission = distance from the
trajectory point to a candidate road edge, transition = agreement between
along-road distance and traveled distance, decoded with Viterbi. The road
network is supplied as polylines (from any source: an OSM extract, a GIS
export); no network access is required.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class RoadNetwork:
    """Edges as 2D polylines: list of (Ni, 2) arrays (same CRS as the
    trajectory, e.g. local ENU meters)."""

    edges: list

    def __post_init__(self):
        self.edges = [np.asarray(e, np.float64) for e in self.edges]

    @staticmethod
    def from_osm_xml(path, origin=None, highway_only=True):
        """Build a road network from an OpenStreetMap XML extract
        (the offline half of the reference's mappymatch-over-OSM flow,
        `georef_mapmatch.py:290-366` — zero-egress environments supply the
        .osm file; this parses it, no fetch involved).

        ``origin`` = (lat, lon) of the local ENU frame; defaults to the
        mean of all way nodes. Ways without a ``highway`` tag are skipped
        unless ``highway_only=False``. Returns ``(network, origin)``.
        """
        import xml.etree.ElementTree as ET

        from ..core.geodesy import LocalCartesian

        root = ET.parse(path).getroot()
        nodes = {}
        for nd in root.iter("node"):
            nodes[nd.get("id")] = (
                float(nd.get("lat")), float(nd.get("lon"))
            )
        ways = []
        for way in root.iter("way"):
            tags = {t.get("k"): t.get("v") for t in way.findall("tag")}
            if highway_only and "highway" not in tags:
                continue
            refs = [nd.get("ref") for nd in way.findall("nd")]
            pts = [nodes[r] for r in refs if r in nodes]
            if len(pts) >= 2:
                ways.append(np.asarray(pts, np.float64))
        if origin is None:
            allp = np.concatenate(ways, axis=0)
            origin = (float(allp[:, 0].mean()), float(allp[:, 1].mean()))
        lc = LocalCartesian.from_origin(origin[0], origin[1], 0.0)
        edges = []
        for w in ways:
            enu = np.asarray(lc.forward(w[:, 0], w[:, 1], np.zeros(len(w))))
            edges.append(enu[:, :2] if enu.ndim == 2 else enu[None, :2])
        return RoadNetwork(edges=edges), origin

    def project_point(self, p):
        """Nearest point on each edge: returns arrays
        (dist (E,), snapped (E, 2), arclen (E,)) where arclen is the
        distance along the edge to the snapped point."""
        dists, snaps, arcs = [], [], []
        for e in self.edges:
            a = e[:-1]
            b = e[1:]
            ab = b - a
            ab2 = np.maximum((ab**2).sum(1), 1e-12)
            t = np.clip(((p - a) * ab).sum(1) / ab2, 0.0, 1.0)
            proj = a + t[:, None] * ab
            d2 = ((proj - p) ** 2).sum(1)
            i = int(np.argmin(d2))
            seg_len = np.sqrt(ab2)
            arc = seg_len[:i].sum() + t[i] * seg_len[i]
            dists.append(np.sqrt(d2[i]))
            snaps.append(proj[i])
            arcs.append(arc)
        return np.asarray(dists), np.asarray(snaps), np.asarray(arcs)


def match_trajectory(
    xy: np.ndarray,
    network: RoadNetwork,
    sigma_obs: float = 5.0,
    beta_transition: float = 2.0,
    max_candidate_dist: float = 30.0,
):
    """Viterbi map matching.

    Returns ``(edge_idx (N,), snapped (N, 2), matched mask (N,))`` —
    points with no candidate edge within ``max_candidate_dist`` are
    unmatched (edge −1, original position).
    """
    xy = np.asarray(xy, np.float64)
    n = len(xy)
    E = len(network.edges)
    dists = np.empty((n, E))
    snaps = np.empty((n, E, 2))
    arcs = np.empty((n, E))
    for i in range(n):
        dists[i], snaps[i], arcs[i] = network.project_point(xy[i])

    # emission log-prob: gaussian on perpendicular distance
    emis = -0.5 * (dists / sigma_obs) ** 2
    emis[dists > max_candidate_dist] = -np.inf

    # transition log-prob: along-road movement should match traveled
    # distance; changing edges costs the endpoint discontinuity
    logp = emis[0].copy()
    back = np.zeros((n, E), int)
    for i in range(1, n):
        step = np.linalg.norm(xy[i] - xy[i - 1])
        trans = np.empty((E, E))
        for e_prev in range(E):
            same = np.abs(np.abs(arcs[i] - arcs[i - 1, e_prev]) - step)
            jump = np.linalg.norm(
                snaps[i] - snaps[i - 1, e_prev], axis=-1
            )
            cost = np.where(np.arange(E) == e_prev, same, jump + step)
            trans[e_prev] = -cost / max(beta_transition, 1e-6)
        scores = logp[:, None] + trans
        back[i] = np.argmax(scores, axis=0)
        logp = scores[back[i], np.arange(E)] + emis[i]

    edge_idx = np.empty(n, int)
    if np.all(np.isinf(logp)):
        return np.full(n, -1), xy.copy(), np.zeros(n, bool)
    edge_idx[-1] = int(np.argmax(logp))
    for i in range(n - 2, -1, -1):
        edge_idx[i] = back[i + 1][edge_idx[i + 1]]
    snapped = snaps[np.arange(n), edge_idx]
    matched = np.isfinite(emis[np.arange(n), edge_idx])
    snapped[~matched] = xy[~matched]
    edge_out = np.where(matched, edge_idx, -1)
    return edge_out, snapped, matched


def route_length(snapped: np.ndarray) -> float:
    """Total matched route length (the distance-total report of
    `georef_mapmatch.py`)."""
    return float(np.linalg.norm(np.diff(snapped, axis=0), axis=1).sum())
