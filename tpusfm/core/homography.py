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
