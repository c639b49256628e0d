"""SIFT statistical parity vs the cv2.SIFT oracle (SURVEY.md §7 hard part
4; VERDICT r1 item 6).  Bit-exactness with vlfeat is neither feasible nor
required — the contract is statistical: comparable repeatability under a
known warp, and comparable two-view match inlier rates, on textured
images."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from tpusfm.features import sift
from tpusfm.matching import match as match_mod


def _texture_image(h=360, w=480, seed=0):
    """Rich multi-scale texture (noise octaves + blobs + edges) — a stand-in
    for a real photograph with structure at every SIFT octave."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for octv in (4, 8, 16, 32, 64):
        n = rng.normal(size=(h // octv + 2, w // octv + 2)).astype(np.float32)
        img += cv2.resize(n, (w, h), interpolation=cv2.INTER_CUBIC) / octv ** 0.5
    ys, xs = np.mgrid[0:h, 0:w]
    for _ in range(30):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        r = rng.uniform(5, 40)
        img += rng.uniform(-1, 1) * np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / r ** 2)
    img -= img.min()
    img /= img.max()
    return img


def _warp(img, angle_deg=12.0, scale=0.9):
    h, w = img.shape
    M = cv2.getRotationMatrix2D((w / 2, h / 2), angle_deg, scale)
    H = np.vstack([M, [0, 0, 1]]).astype(np.float64)
    out = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR)
    return out, H


def _apply_h(H, pts):
    p = np.concatenate([pts, np.ones((len(pts), 1))], 1) @ H.T
    return p[:, :2] / p[:, 2:3]


def _repeatability(kp_a, kp_b, H, tol=3.0):
    """Fraction of A keypoints (landing in-bounds) with a B keypoint within
    tol of their H-mapped location."""
    if len(kp_a) == 0 or len(kp_b) == 0:
        return 0.0
    mapped = _apply_h(H, kp_a)
    d = np.linalg.norm(mapped[:, None] - kp_b[None], axis=-1)
    return float((d.min(axis=1) < tol).mean())


def _tpusfm_feats(img):
    cfg = sift.preset("NORMAL", max_features=1200, max_per_octave=1200)
    f = sift.detect_and_describe(jnp.asarray(img[None]))
    m = np.asarray(f.mask[0])
    return np.asarray(f.kp[0])[m][:, :2], np.asarray(f.desc[0])[m]


def _cv2_feats(img):
    s = cv2.SIFT_create(nfeatures=1200)
    kps, desc = s.detectAndCompute((img * 255).astype(np.uint8), None)
    if desc is None:
        return np.zeros((0, 2)), np.zeros((0, 128), np.float32)
    return np.asarray([k.pt for k in kps]), desc


def _match_inlier_rate(kp0, d0, kp1, d1, H, tol=3.0):
    """Ratio-test match then check correspondences against the warp."""
    if len(kp0) < 8 or len(kp1) < 8:
        return 0.0, 0
    bf = cv2.BFMatcher(cv2.NORM_L2)
    knn = bf.knnMatch(np.asarray(d0, np.float32), np.asarray(d1, np.float32), k=2)
    good = [m for m, n in (p for p in knn if len(p) == 2)
            if m.distance < 0.8 * n.distance]
    if not good:
        return 0.0, 0
    p0 = kp0[[m.queryIdx for m in good]]
    p1 = kp1[[m.trainIdx for m in good]]
    err = np.linalg.norm(_apply_h(H, p0) - p1, axis=1)
    return float((err < tol).mean()), len(good)


@pytest.fixture(scope="module")
def scene():
    img = _texture_image()
    warped, H = _warp(img)
    return img, warped, H


def test_repeatability_comparable_to_cv2(scene):
    img, warped, H = scene
    kp_t0, _ = _tpusfm_feats(img)
    kp_t1, _ = _tpusfm_feats(warped)
    kp_c0, _ = _cv2_feats(img)
    kp_c1, _ = _cv2_feats(warped)
    rep_t = _repeatability(kp_t0, kp_t1, H)
    rep_c = _repeatability(kp_c0, kp_c1, H)
    # Keypoint counts in the same regime and repeatability within 25
    # relative % of the cv2 oracle.
    assert len(kp_t0) > 200, len(kp_t0)
    assert rep_t > 0.5, f"tpusfm repeatability {rep_t:.3f}"
    assert rep_t > 0.75 * rep_c, f"tpusfm {rep_t:.3f} vs cv2 {rep_c:.3f}"


def test_match_inlier_rate_comparable_to_cv2(scene):
    img, warped, H = scene
    kp_t0, d_t0 = _tpusfm_feats(img)
    kp_t1, d_t1 = _tpusfm_feats(warped)
    kp_c0, d_c0 = _cv2_feats(img)
    kp_c1, d_c1 = _cv2_feats(warped)
    rate_t, n_t = _match_inlier_rate(kp_t0, d_t0, kp_t1, d_t1, H)
    rate_c, n_c = _match_inlier_rate(kp_c0, d_c0, kp_c1, d_c1, H)
    assert n_t > 100, f"only {n_t} tpusfm matches"
    assert rate_t > 0.7, f"tpusfm inlier rate {rate_t:.3f}"
    assert rate_t > 0.8 * rate_c, f"tpusfm {rate_t:.3f} vs cv2 {rate_c:.3f}"
    # Match volume in the same regime (>= 40% of the oracle's).
    assert n_t > 0.4 * n_c, f"{n_t} vs cv2 {n_c}"


def test_own_matcher_agrees_with_bf_oracle(scene):
    """The pipeline's own ratio matcher finds the same correspondences as
    cv2's BFMatcher on identical descriptors (exact L2, same ratio)."""
    img, warped, H = scene
    kp0, d0 = _tpusfm_feats(img)
    kp1, d1 = _tpusfm_feats(warped)
    n = min(len(d0), len(d1), 512)
    da = jnp.asarray(d0[:n], jnp.float32)[None]
    db = jnp.asarray(d1[:n], jnp.float32)[None]
    m = jnp.ones((1, n), bool)
    idx, ok = match_mod.match_descriptors(da, db, m, m, ratio=0.8)
    idx, ok = np.asarray(idx[0]), np.asarray(ok[0])

    bf = cv2.BFMatcher(cv2.NORM_L2)
    knn = bf.knnMatch(d0[:n].astype(np.float32), d1[:n].astype(np.float32), k=2)
    ref = {}
    for p in knn:
        if len(p) == 2 and p[0].distance < 0.8 * p[1].distance:
            ref[p[0].queryIdx] = p[0].trainIdx
    ours = {int(i): int(idx[i]) for i in np.nonzero(ok)[0]}
    # Cross-check makes ours a subset-style matcher; agreement on shared
    # queries must be near-total.
    shared = set(ref) & set(ours)
    agree = sum(ref[q] == ours[q] for q in shared)
    assert len(shared) > 50
    assert agree / len(shared) > 0.95
