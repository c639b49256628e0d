"""Synthetic multi-view scene generators shared across tests and bench.

The integration-test ladder (SURVEY.md §4, BASELINE.md configs): two-view →
20-image tabletop → 200-image, each with known ground truth."""

from __future__ import annotations

import numpy as np

from tpusfm.core import lie
import jax.numpy as jnp


def orbit_scene(
    n_cams: int = 20,
    n_points: int = 500,
    radius: float = 6.0,
    arc_deg: float = 120.0,
    noise_px: float = 0.0,
    seed: int = 0,
    img_w: int = 640,
    img_h: int = 480,
    focal: float = 800.0,
    min_track_len: int = 2,
    vis_prob: float = 0.85,
    k1: float = 0.0,
    k2: float = 0.0,
    k3: float = 0.0,
):
    """Cameras orbit a point cloud at the origin ("tabletop" sequence).

    Returns a dict of numpy arrays: intr (7,), R (C,3,3), t (C,3), centers,
    points (P,3), and the observation table (obs_cam, obs_pt, obs_uv) for
    points visible (in front + in frame + bernoulli(vis_prob))."""
    rng = np.random.default_rng(seed)
    X = rng.uniform([-1.5, -1.5, -1.5], [1.5, 1.5, 1.5], size=(n_points, 3))
    intr = np.array([focal, focal, img_w / 2, img_h / 2, k1, k2, k3], np.float32)

    angles = np.radians(np.linspace(0, arc_deg, n_cams))
    centers = np.stack(
        [radius * np.sin(angles), 0.3 * np.sin(2 * angles), -radius * np.cos(angles)],
        axis=1,
    )
    Rs, ts = [], []
    for c in centers:
        # Look-at the origin: z-axis toward origin, y roughly down.
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=0)  # world -> cam rows
        Rs.append(R)
        ts.append(-R @ c)
    R = np.asarray(Rs, np.float32)
    t = np.asarray(ts, np.float32)

    obs_cam, obs_pt, obs_uv = [], [], []
    for ci in range(n_cams):
        Xc = X @ R[ci].T + t[ci]
        z = Xc[:, 2]
        xn = Xc[:, :2] / z[:, None]
        r2 = np.sum(xn * xn, axis=-1, keepdims=True)
        xn = xn * (1.0 + r2 * (k1 + r2 * (k2 + r2 * k3)))
        uv = xn * focal + np.array([img_w / 2, img_h / 2])
        vis = (
            (z > 0.5)
            & (uv[:, 0] >= 0) & (uv[:, 0] < img_w)
            & (uv[:, 1] >= 0) & (uv[:, 1] < img_h)
            & (rng.random(n_points) < vis_prob)
        )
        idx = np.nonzero(vis)[0]
        obs_cam.append(np.full(len(idx), ci, np.int32))
        obs_pt.append(idx.astype(np.int32))
        obs_uv.append(uv[idx] + rng.normal(scale=noise_px, size=(len(idx), 2)))
    obs_cam = np.concatenate(obs_cam)
    obs_pt = np.concatenate(obs_pt)
    obs_uv = np.concatenate(obs_uv).astype(np.float32)

    # Drop points with too-short tracks.
    counts = np.bincount(obs_pt, minlength=n_points)
    keep_pt = counts >= min_track_len
    keep_obs = keep_pt[obs_pt]
    return dict(
        intr=intr,
        R=R,
        t=t,
        aa=np.asarray(lie.so3_log(jnp.asarray(R))),
        centers=centers.astype(np.float32),
        points=X.astype(np.float32),
        point_valid=keep_pt,
        obs_cam=obs_cam[keep_obs],
        obs_pt=obs_pt[keep_obs],
        obs_uv=obs_uv[keep_obs],
        img_w=img_w,
        img_h=img_h,
    )
