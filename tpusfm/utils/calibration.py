"""Chessboard camera calibration.

Capability parity with ``calibrateCameraFromImages``
(src/common/common.h:74-139: findChessboardCorners -> cornerSubPix ->
cv::calibrateCamera).  Corner *detection* stays a host-side OpenCV call
(the reference uses OpenCV for this too); the *calibration solve* is our
own: Zhang's closed-form initialization from per-view homographies
(tpusfm.core.homography) followed by a joint Gauss-Newton refinement of
shared intrinsics [fx, fy, cx, cy, k1, k2] and per-view poses in JAX.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import homography, lie


def board_points(cols: int, rows: int, square_size: float = 1.0) -> np.ndarray:
    """Inner-corner grid on the z=0 plane, row-major (OpenCV ordering)."""
    xs, ys = np.meshgrid(np.arange(cols), np.arange(rows))
    return np.stack([xs.ravel(), ys.ravel(), np.zeros(cols * rows)], 1).astype(np.float64) * square_size


def find_chessboard_corners(images, pattern=(9, 6)):
    """Detect inner corners in each image (host OpenCV, subpixel refined).
    Returns (corners list of (N,2) float32 or None per image)."""
    import cv2

    out = []
    for img in np.asarray(images):
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        ok, corners = cv2.findChessboardCorners(img, pattern)
        if not ok:
            out.append(None)
            continue
        corners = cv2.cornerSubPix(
            img, corners, (5, 5), (-1, -1),
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 1e-3),
        )
        out.append(corners.reshape(-1, 2).astype(np.float32))
    return out


def _intrinsics_from_homographies(Hs: np.ndarray) -> np.ndarray:
    """Zhang's method: each H gives two constraints on B = K^-T K^-1."""
    def v(H, i, j):
        return np.array([
            H[0, i] * H[0, j],
            H[0, i] * H[1, j] + H[1, i] * H[0, j],
            H[1, i] * H[1, j],
            H[2, i] * H[0, j] + H[0, i] * H[2, j],
            H[2, i] * H[1, j] + H[1, i] * H[2, j],
            H[2, i] * H[2, j],
        ])

    rows = []
    for H in Hs:
        rows.append(v(H, 0, 1))
        rows.append(v(H, 0, 0) - v(H, 1, 1))
    A = np.asarray(rows)
    _, _, Vt = np.linalg.svd(A)
    b11, b12, b22, b13, b23, b33 = Vt[-1]
    cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = np.sqrt(abs(lam / b11))
    fy = np.sqrt(abs(lam * b11 / (b11 * b22 - b12 * b12)))
    cx = -b13 * fx * fx / lam
    return np.array([fx, fy, cx, cy], np.float64)


def _pose_from_homography(H: np.ndarray, K: np.ndarray):
    """Extrinsics for a z=0 plane view: H = K [r1 r2 t]."""
    M = np.linalg.inv(K) @ H
    s = 1.0 / np.linalg.norm(M[:, 0])
    if M[2, 2] * s < 0:  # board in front of camera
        s = -s
    r1 = M[:, 0] * s
    r2 = M[:, 1] * s
    t = M[:, 2] * s
    r3 = np.cross(r1, r2)
    R = np.stack([r1, r2, r3], axis=1)
    U, _, Vt = np.linalg.svd(R)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = U @ np.diag([1, 1, -1]) @ Vt
    return R, t


def calibrate_camera(corner_lists, pattern=(9, 6), square_size: float = 1.0,
                     image_size=None, refine_steps: int = 30):
    """Calibrate from detected corners (list over views; None entries are
    skipped).  Returns (intr (7,) [fx,fy,cx,cy,k1,k2,0], rms_px, n_views)."""
    obj = board_points(*pattern, square_size)  # (N, 3)
    views = [c for c in corner_lists if c is not None]
    if len(views) < 3:
        raise ValueError(f"need >= 3 chessboard views, got {len(views)}")

    # Closed-form init from homographies.
    Hs = []
    for c in views:
        H = np.asarray(homography.homography_dlt(
            jnp.asarray(obj[:, :2].astype(np.float32)), jnp.asarray(c)
        ))
        Hs.append(H / H[2, 2])
    fx, fy, cx, cy = _intrinsics_from_homographies(np.asarray(Hs))
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    poses = [_pose_from_homography(H, K) for H in Hs]

    # Joint GN refinement in JAX: shared [fx fy cx cy k1 k2] + 6 per view.
    V = len(views)
    uv = jnp.asarray(np.stack(views))  # (V, N, 2)
    X = jnp.asarray(obj.astype(np.float32))  # (N, 3)
    aa0 = np.stack([np.asarray(lie.so3_log(jnp.asarray(R))) for R, _ in poses])
    t0 = np.stack([t for _, t in poses])
    params0 = jnp.asarray(np.concatenate(
        [[fx, fy, cx, cy, 0.0, 0.0], np.concatenate([aa0, t0], 1).ravel()]
    ).astype(np.float32))

    def residuals(p):
        intr = p[:6]
        pose = p[6:].reshape(V, 6)
        Xc = jax.vmap(lambda ps: lie.rotate_aa(ps[None, :3], X) + ps[3:6])(pose)
        z = Xc[..., 2:3]
        xn = Xc[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        r2 = jnp.sum(xn * xn, -1, keepdims=True)
        scale = 1.0 + r2 * (intr[4] + r2 * intr[5])
        proj = xn * scale * intr[:2] + intr[2:4]
        return (proj - uv).reshape(-1)

    @jax.jit
    def gn(params):
        def step(p, _):
            r = residuals(p)
            J = jax.jacfwd(residuals)(p)
            H = J.T @ J + 1e-6 * jnp.eye(p.shape[0])
            dp = jnp.linalg.solve(H, J.T @ r)
            p_new = p - dp
            better = jnp.sum(residuals(p_new) ** 2) <= jnp.sum(r ** 2)
            return jnp.where(better, p_new, p), None

        out, _ = jax.lax.scan(step, params, None, length=refine_steps)
        return out, jnp.sqrt(jnp.mean(residuals(out) ** 2))

    params, rms = gn(params0)
    p = np.asarray(params)
    intr = np.array([p[0], p[1], p[2], p[3], p[4], p[5], 0.0], np.float32)
    return intr, float(rms), V


def calibrate_camera_from_images(images, pattern=(9, 6), square_size: float = 1.0):
    """End-to-end parity with common.h:74-139: images -> intrinsics."""
    corners = find_chessboard_corners(images, pattern)
    return calibrate_camera(corners, pattern, square_size)
