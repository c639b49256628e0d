"""Track building: fuse pairwise matches into multi-view tracks.

The reference grows tracks incrementally through WorldPoint observation
lists and per-image keypoint->point maps (src/world/WorldPoint.h:23,
src/component/Image.h:150-160, savePointCloudToWorld at
src/actuator/SequentialActuator.h:25-72); OpenMVG builds tracks with a
union-find over match edges.  Here: a host-side union-find over (view,
feature) nodes producing a fixed-capacity track table the device kernels
consume.  (Integer bookkeeping, not compute — an array union-find over the
mesh is the pod-scale follow-up, SURVEY.md §7 hard part 2.)
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, i: int) -> int:
        p = self.parent
        root = i
        while p[root] != root:
            root = p[root]
        while p[i] != root:  # path compression
            p[i], i = root, p[i]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_tracks(
    n_views: int,
    n_feats: int,
    pair_list: np.ndarray,
    match_idx: np.ndarray,
    match_valid: np.ndarray,
    min_length: int = 2,
):
    """Fuse matches into tracks.

    pair_list (P, 2) view pairs; match_idx (P, N) index into view j's features
    for each of view i's features; match_valid (P, N).

    Returns (track_ids (n_views, n_feats) int32 — -1 for featureless slots,
    n_tracks).  Tracks containing two features of the same view (inconsistent
    matches) are dropped, as are tracks shorter than min_length.
    """
    uf = UnionFind(n_views * n_feats)
    for p, (i, j) in enumerate(np.asarray(pair_list)):
        fi = np.nonzero(match_valid[p])[0]
        fj = match_idx[p][fi]
        for a, b in zip(fi, fj):
            uf.union(int(i) * n_feats + int(a), int(j) * n_feats + int(b))

    # Collect roots for every node that participated in a match.
    nodes = np.nonzero(uf.parent != np.arange(len(uf.parent)))[0]
    all_nodes = set(nodes.tolist())
    for n in nodes:
        all_nodes.add(uf.find(int(n)))
    all_nodes = np.fromiter(all_nodes, dtype=np.int64)

    roots = np.asarray([uf.find(int(n)) for n in all_nodes], dtype=np.int64)
    track_ids = np.full((n_views, n_feats), -1, dtype=np.int32)

    # Group nodes by root.
    order = np.argsort(roots, kind="stable")
    sorted_roots = roots[order]
    sorted_nodes = all_nodes[order]
    boundaries = np.nonzero(np.diff(sorted_roots))[0] + 1
    groups = np.split(sorted_nodes, boundaries)

    tid = 0
    for g in groups:
        if len(g) < min_length:
            continue
        views = g // n_feats
        if len(np.unique(views)) != len(views):
            continue  # inconsistent: two features of one view in a track
        if len(views) < min_length:
            continue
        track_ids[views, g % n_feats] = tid
        tid += 1
    return track_ids, tid


def track_observations(track_ids: np.ndarray, kp_xy: np.ndarray):
    """track_ids (V, N), kp_xy (V, N, 2) -> per-track observation lists:
    dict track -> (views (L,), uv (L, 2)).  Host-side helper for
    triangulation scheduling."""
    out: dict[int, tuple[list[int], list[np.ndarray]]] = {}
    vs, fs = np.nonzero(track_ids >= 0)
    for v, f in zip(vs, fs):
        t = int(track_ids[v, f])
        if t not in out:
            out[t] = ([], [])
        out[t][0].append(int(v))
        out[t][1].append(kp_xy[v, f])
    return {
        t: (np.asarray(v, np.int32), np.asarray(u, np.float32))
        for t, (v, u) in out.items()
    }
