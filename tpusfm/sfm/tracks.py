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
    """Scalar reference implementation (kept for clarity/tests); the
    production path below is the vectorized label-propagation pass."""

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

    Implementation is a fully vectorized connected-components pass
    (min-label propagation + pointer jumping, O(E log V) numpy) — the
    per-edge Python union-find was the single largest host cost in the
    end-to-end pipeline (~tens of seconds at a few hundred thousand
    matches)."""
    pair_list = np.asarray(pair_list)
    match_idx = np.asarray(match_idx)
    match_valid = np.asarray(match_valid)
    track_ids = np.full((n_views, n_feats), -1, dtype=np.int32)
    if len(pair_list) == 0 or not match_valid.any():
        return track_ids, 0

    pv, fv = np.nonzero(match_valid)
    a = pair_list[pv, 0].astype(np.int64) * n_feats + fv
    b = pair_list[pv, 1].astype(np.int64) * n_feats + match_idx[pv, fv]
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)

    labels = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = np.minimum(labels[ai], labels[bi])
        new = labels.copy()
        np.minimum.at(new, ai, m)
        np.minimum.at(new, bi, m)
        new = new[new]  # pointer jumping
        if np.array_equal(new, labels):
            break
        labels = new

    roots, comp = np.unique(labels, return_inverse=True)  # comp: node -> cc id
    views = nodes // n_feats
    feats = nodes % n_feats

    # Component sizes and per-(component, view) duplicate detection.
    sizes = np.bincount(comp)
    order = np.lexsort((views, comp))
    cs = comp[order]
    vs = views[order]
    dup = (cs[1:] == cs[:-1]) & (vs[1:] == vs[:-1])
    bad = np.zeros(len(roots), bool)
    bad[cs[1:][dup]] = True  # inconsistent: two features of one view
    keep = (sizes >= min_length) & ~bad

    tid_of_comp = np.full(len(roots), -1, np.int64)
    tid_of_comp[keep] = np.arange(int(keep.sum()))
    tids = tid_of_comp[comp]
    sel = tids >= 0
    track_ids[views[sel], feats[sel]] = tids[sel].astype(np.int32)
    return track_ids, int(keep.sum())


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
