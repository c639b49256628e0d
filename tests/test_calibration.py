"""Chessboard calibration on synthetically rendered boards with known K."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tpusfm.core import lie  # noqa: E402
from tpusfm.utils import calibration  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def render_board_views(n_views=6, pattern=(9, 6), img=(480, 640),
                       fx=600.0, fy=590.0, cx=325.0, cy=245.0, k1=-0.05, seed=0):
    """Render checkerboards with cv2.warpPerspective through known K and
    poses; returns (images, K_true)."""
    rng = np.random.default_rng(seed)
    cols, rows = pattern
    sq = 40
    board = np.zeros(((rows + 1) * sq, (cols + 1) * sq), np.uint8)
    for r in range(rows + 1):
        for c in range(cols + 1):
            if (r + c) % 2 == 0:
                board[r * sq : (r + 1) * sq, c * sq : (c + 1) * sq] = 255
    board = np.pad(board, sq, constant_values=128)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    images = []
    h, w = img
    for v in range(n_views):
        aa = rng.normal(scale=0.25, size=3) * np.array([1, 1, 0.5])
        R = np.asarray(lie.so3_exp(jnp.asarray(aa)))
        t = np.array([rng.normal(0, 0.6) - (cols / 2) * 0.0, rng.normal(0, 0.4), rng.uniform(9, 13)])
        # Map board plane coords (units of squares, z=0) to pixels.
        # Board image pixel (bx, by) -> plane coords ((bx-sq)/sq - ... ):
        # plane (x, y) in square units corresponds to board pixel
        # (sq + (x+1)*sq? ). Corner (0,0) is at board pixel (2sq, 2sq).
        Hplane = K @ np.column_stack([R[:, 0], R[:, 1], t])
        # Center the board: plane coords relative to the inner-corner grid
        # center so views keep it in frame (the pose offset is absorbed into
        # the recovered extrinsics).
        ccx, ccy = (cols - 1) / 2.0, (rows - 1) / 2.0
        S = np.array([[1.0 / sq, 0, -2.0 - ccx], [0, 1.0 / sq, -2.0 - ccy], [0, 0, 1]])
        H = Hplane @ S  # board pixel -> image
        # distortion ignored in warp when k1 small? apply none for exactness
        warped = cv2.warpPerspective(board, H.astype(np.float64), (w, h),
                                     flags=cv2.INTER_LINEAR, borderValue=90)
        images.append(warped)
    return np.stack(images), K


def test_calibration_recovers_intrinsics():
    images, K_true = render_board_views()
    corners = calibration.find_chessboard_corners(images, (9, 6))
    n_found = sum(c is not None for c in corners)
    assert n_found >= 4, f"chessboard found in only {n_found} views"
    intr, rms, V = calibration.calibrate_camera(corners, (9, 6))
    assert rms < 0.5, f"calibration RMS {rms}px"
    assert abs(intr[0] - K_true[0, 0]) / K_true[0, 0] < 0.02
    assert abs(intr[1] - K_true[1, 1]) / K_true[1, 1] < 0.02
    assert abs(intr[2] - K_true[0, 2]) < 15
    assert abs(intr[3] - K_true[1, 2]) < 15


def test_board_points_layout():
    pts = calibration.board_points(9, 6, square_size=2.0)
    assert pts.shape == (54, 3)
    assert pts[1, 0] == 2.0 and pts[9, 1] == 2.0 and np.all(pts[:, 2] == 0)
