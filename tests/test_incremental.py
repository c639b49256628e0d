"""Integration: incremental SfM on synthetic tracks with known ground truth
(BASELINE.md config 2 minus the image-space feature stage — features are
simulated as noisy keypoint observations with perfect data association
corrupted by a fraction of wrong matches)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusfm.sfm import incremental, tracks
from tpusfm.utils import metrics
from synth import orbit_scene


def scene_to_feature_tracks(s, n_feats=None, wrong_frac=0.0, seed=0):
    """Convert a synth observation table into (kp, track_ids) arrays as if a
    matcher had produced them."""
    rng = np.random.default_rng(seed)
    V = len(s["R"])
    # Per-view feature list = its observations.
    per_view = [np.nonzero(s["obs_cam"] == v)[0] for v in range(V)]
    N = n_feats or max(len(p) for p in per_view)
    kp = np.zeros((V, N, 2), np.float32)
    track_ids = np.full((V, N), -1, np.int32)
    for v, rows in enumerate(per_view):
        rows = rows[:N]
        kp[v, : len(rows)] = s["obs_uv"][rows]
        track_ids[v, : len(rows)] = s["obs_pt"][rows]
    # Corrupt a fraction of associations (wrong track id).
    if wrong_frac > 0:
        flat = np.nonzero(track_ids >= 0)
        n_bad = int(len(flat[0]) * wrong_frac)
        pick = rng.choice(len(flat[0]), n_bad, replace=False)
        track_ids[flat[0][pick], flat[1][pick]] = rng.integers(
            0, track_ids.max() + 1, n_bad
        )
    return kp, track_ids


@pytest.mark.parametrize("noise_px,wrong_frac,ate_bound", [(0.3, 0.0, 0.01), (0.5, 0.03, 0.02)])
def test_incremental_20_views(noise_px, wrong_frac, ate_bound):
    s = orbit_scene(n_cams=12, n_points=250, noise_px=noise_px, seed=5, arc_deg=100.0)
    kp, track_ids = scene_to_feature_tracks(s, wrong_frac=wrong_frac)
    n_tracks = int(track_ids.max()) + 1
    intr = np.tile(s["intr"], (len(s["R"]), 1))
    cfg = incremental.IncrementalConfig(ransac_iters=256, pnp_iters=128, ba_every=4)
    eng = incremental.IncrementalEngine(kp, intr, track_ids, n_tracks, cfg)
    scene = eng.run(jax.random.PRNGKey(0))

    reg = np.asarray(scene.cam_mask)
    assert reg.sum() >= 11, f"only {reg.sum()} views registered; log: {eng.log}"
    centers = np.asarray(scene.camera_centers())[reg]
    ate = metrics.ate_rmse(centers, s["centers"][reg])
    assert ate < ate_bound, f"ATE {ate:.4f}; log: {eng.log[-3:]}"
    # Most surviving points close to ground truth after alignment: implied by
    # low reprojection error across many views.
    errs = np.asarray(scene.reprojection_errors())
    mask = np.asarray(scene.obs_mask)
    assert errs[mask].mean() < 1.5 * max(noise_px, 0.1)


def test_track_building_from_matches():
    # Three views, chains 0-1-2 plus an inconsistent track.
    V, N = 3, 6
    pair_list = np.asarray([[0, 1], [1, 2], [0, 2]], np.int32)
    match_idx = np.zeros((3, N), np.int32)
    match_valid = np.zeros((3, N), bool)
    # feature k in view 0 matches feature k in view 1, etc.
    for p in range(3):
        for k in range(3):
            match_idx[p, k] = k
            match_valid[p, k] = True
    # Inconsistent: view0 feat 4 -> view1 feat 4 AND view0 feat 5 -> view1 feat 4
    match_idx[0, 4] = 4
    match_valid[0, 4] = True
    match_idx[0, 5] = 4
    match_valid[0, 5] = True
    tid, n = tracks.build_tracks(V, N, pair_list, match_idx, match_valid)
    # 3 clean 3-view tracks.
    for k in range(3):
        assert tid[0, k] == tid[1, k] == tid[2, k] >= 0
    # Inconsistent track dropped.
    assert tid[0, 4] == -1 and tid[0, 5] == -1 and tid[1, 4] == -1
    assert n == 3


def test_track_min_length():
    V, N = 4, 4
    pair_list = np.asarray([[0, 1]], np.int32)
    match_idx = np.zeros((1, N), np.int32)
    match_valid = np.zeros((1, N), bool)
    match_idx[0, 0] = 2
    match_valid[0, 0] = True
    tid, n = tracks.build_tracks(V, N, pair_list, match_idx, match_valid, min_length=3)
    assert n == 0 and (tid == -1).all()
    tid, n = tracks.build_tracks(V, N, pair_list, match_idx, match_valid, min_length=2)
    assert n == 1 and tid[0, 0] == 0 and tid[1, 2] == 0


def test_incremental_windowed_local_ba_matches_full():
    """The windowed local step-BA path (ba_local_from_obs forced on) must
    reach the same quality as full-map step-BAs: local solves keep every
    observation of the windowed points and freeze older cameras, and the
    final BAs are always full-map (round-4 verdict item 1)."""
    s = orbit_scene(n_cams=16, n_points=300, noise_px=0.4, seed=7, arc_deg=120.0)
    kp, track_ids = scene_to_feature_tracks(s)
    n_tracks = int(track_ids.max()) + 1
    intr = np.tile(s["intr"], (len(s["R"]), 1))
    cfg = incremental.IncrementalConfig(
        ransac_iters=256, pnp_iters=128, ba_every=4,
        ba_local_from_obs=1, ba_local_window=6, register_batch=2)
    eng = incremental.IncrementalEngine(kp, intr, track_ids, n_tracks, cfg)
    scene = eng.run(jax.random.PRNGKey(0))
    reg = np.asarray(scene.cam_mask)
    assert reg.sum() >= 15, f"only {reg.sum()} registered; log: {eng.log}"
    centers = np.asarray(scene.camera_centers())[reg]
    ate = metrics.ate_rmse(centers, s["centers"][reg])
    assert ate < 0.02, f"ATE {ate:.4f}; log: {eng.log[-4:]}"


def test_incremental_dirty_triangulation_covers_map():
    """Dirty-track triangulation must reach the same structure coverage as
    the old full-sweep version: every track with two well-separated
    registered views ends up triangulated."""
    s = orbit_scene(n_cams=10, n_points=200, noise_px=0.2, seed=3, arc_deg=90.0)
    kp, track_ids = scene_to_feature_tracks(s)
    n_tracks = int(track_ids.max()) + 1
    intr = np.tile(s["intr"], (len(s["R"]), 1))
    eng = incremental.IncrementalEngine(
        kp, intr, track_ids, n_tracks,
        incremental.IncrementalConfig(ransac_iters=256, pnp_iters=128))
    scene = eng.run(jax.random.PRNGKey(1))
    n_pts = int(np.asarray(scene.point_mask).sum())
    assert n_pts >= 150, f"{n_pts} points; log: {eng.log[-4:]}"
