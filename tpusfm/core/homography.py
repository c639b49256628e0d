"""Homography estimation (normalized DLT) and transfer error.

Capability parity with OpenMVG's 'h' geometric-filter model option
(src/sparseBuilder/sparseBuilder.cpp:1037-1040,1228-1236: HOMOGRAPHY_MATRIX).
Batched over leading dimensions for RANSAC hypothesis sets.
"""

from __future__ import annotations

import jax.numpy as jnp

from .epipolar import _normalize_points


def homography_dlt(x0: jnp.ndarray, x1: jnp.ndarray, w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normalized DLT homography from >= 4 correspondences.

    x0, x1: (..., N, 2) with x1h ~ H x0h.  Returns (..., 3, 3) with H[2,2]=1
    up to normalization."""
    if w is None:
        w = jnp.ones(x0.shape[:-1], dtype=x0.dtype)
    x0n, T0 = _normalize_points(x0, w)
    x1n, T1 = _normalize_points(x1, w)
    u, v = x0n[..., 0], x0n[..., 1]
    up, vp = x1n[..., 0], x1n[..., 1]
    zeros = jnp.zeros_like(u)
    ones = jnp.ones_like(u)
    # Two rows per correspondence of the standard DLT system A h = 0.
    r1 = jnp.stack([-u, -v, -ones, zeros, zeros, zeros, up * u, up * v, up], axis=-1)
    r2 = jnp.stack([zeros, zeros, zeros, -u, -v, -ones, vp * u, vp * v, vp], axis=-1)
    A = jnp.concatenate([r1 * w[..., None], r2 * w[..., None]], axis=-2)  # (..., 2N, 9)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    from .triangulate import smallest_eigvec_sym

    h = smallest_eigvec_sym(AtA, iters=8)
    Hn = h.reshape(*h.shape[:-1], 3, 3)
    T1inv = jnp.linalg.inv(T1)
    H = T1inv @ Hn @ T0
    return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < 1e-12, 1e-12, H[..., 2:3, 2:3])


def decompose_homography(Hn: jnp.ndarray):
    """Decompose a *normalized-coordinate* homography into rigid motions.

    Hn (..., 3, 3) with x1n ~ Hn x0n (calibrated coords; for pixels use
    K1^-1 H K0 first).  Returns (R (..., 4, 3, 3), t (..., 4, 3),
    n (..., 4, 3)): the four physical solutions of H = R + t n^T / d with
    |t| scaled so |t| = baseline/d (plane distance absorbed).  The caller
    disambiguates by cheirality (count of points in front), exactly like
    essential decomposition.

    Closed-form per Ma-Soatto-Kosecka-Sastry, "An Invitation to 3-D
    Vision", Thm 5.19 — fully batched: one 3x3 SVD + cross products, no
    branching (the degenerate pure-rotation case collapses all four
    candidates onto R = H, t = 0, which cheirality scoring handles).

    Capability parity: cv::decomposeHomographyMat / COLMAP's H-based
    two-view initialization — the reference's OpenCV path exposes the same
    operation for planar scenes.
    """
    U, S, Vt = jnp.linalg.svd(Hn)
    s2 = jnp.maximum(S[..., 1], 1e-12)
    Hb = Hn / s2[..., None, None]
    # det(Hb) must be +1-ish for a physical motion; flip sign if negative
    # (H is only defined up to sign).
    sgn = jnp.sign(jnp.linalg.det(Hb))
    sgn = jnp.where(sgn == 0, 1.0, sgn)[..., None, None]
    Hb = Hb * sgn
    _, Sb, Vbt = jnp.linalg.svd(Hb)
    s1 = Sb[..., 0]
    s3 = Sb[..., 2]
    v1 = Vbt[..., 0, :]
    v2 = Vbt[..., 1, :]
    v3 = Vbt[..., 2, :]

    denom = jnp.sqrt(jnp.maximum(s1 * s1 - s3 * s3, 1e-12))[..., None]
    a = jnp.sqrt(jnp.maximum(1.0 - s3 * s3, 0.0))[..., None]
    b = jnp.sqrt(jnp.maximum(s1 * s1 - 1.0, 0.0))[..., None]
    u1 = (a * v1 + b * v3) / denom
    u2 = (a * v1 - b * v3) / denom

    def frame(x, y):
        return jnp.stack([x, y, jnp.cross(x, y)], axis=-1)  # columns

    Hv2 = jnp.einsum("...ij,...j->...i", Hb, v2)

    def solution(u):
        Hu = jnp.einsum("...ij,...j->...i", Hb, u)
        U1 = frame(v2, u)
        W1 = frame(Hv2, Hu)
        R = W1 @ jnp.swapaxes(U1, -1, -2)
        n = jnp.cross(v2, u)
        t = jnp.einsum("...ij,...j->...i", Hb - R, n)
        return R, t, n

    Ra, ta, na = solution(u1)
    Rb, tb, nb = solution(u2)
    R = jnp.stack([Ra, Ra, Rb, Rb], axis=-3)
    t = jnp.stack([ta, -ta, tb, -tb], axis=-2)
    n = jnp.stack([na, -na, nb, -nb], axis=-2)
    return R, t, n


def homography_transfer_error(H: jnp.ndarray, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """Forward transfer squared error |x1 - proj(H x0)|^2. Returns (..., N)."""
    ones = jnp.ones(x0.shape[:-1] + (1,), dtype=x0.dtype)
    p0 = jnp.concatenate([x0, ones], axis=-1)
    q = jnp.einsum("...ij,...nj->...ni", H, p0)
    zq = q[..., 2:3]
    zq = jnp.where(jnp.abs(zq) < 1e-12, 1e-12, zq)
    proj = q[..., :2] / zq
    d = proj - x1
    return jnp.sum(d * d, axis=-1)
