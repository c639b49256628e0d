"""Two-view epipolar geometry: normalized 8-point F/E, E decomposition,
pose recovery, and epipolar error metrics.

Capability parity with the reference's geometric filtering and bootstrap:
cv::findEssentialMat / recoverPose (src/actuator/SequentialActuator.h:108-131)
and OpenMVG's F/E AC-RANSAC filter models
(src/sparseBuilder/sparseBuilder.cpp:1037-1040, 1168-1237).

Solvers are written to batch over hypothesis sets: a leading batch dimension on
the correspondence arrays yields one model per batch row — the unit of work for
fixed-size RANSAC (SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import jax.numpy as jnp


def _normalize_points(x: jnp.ndarray, w: jnp.ndarray | None = None):
    """Hartley normalization: translate centroid to origin, scale mean norm to
    sqrt(2).  x: (..., N, 2), optional weights (..., N) for masked samples.
    Returns (x_norm, T) with T (..., 3, 3) such that x_norm_h = T @ x_h."""
    if w is None:
        w = jnp.ones(x.shape[:-1], dtype=x.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    mean = jnp.sum(x * w[..., None], axis=-2, keepdims=True) / wsum[..., None]
    centered = x - mean
    dist = jnp.sqrt(jnp.sum(centered * centered, axis=-1) + 1e-18)
    mean_dist = jnp.sum(dist * w, axis=-1, keepdims=True) / wsum
    scale = jnp.sqrt(2.0) / jnp.maximum(mean_dist, 1e-9)
    xn = centered * scale[..., None]
    s = scale[..., 0]
    mx = mean[..., 0, 0]
    my = mean[..., 0, 1]
    zeros = jnp.zeros_like(s)
    ones = jnp.ones_like(s)
    T = jnp.stack(
        [
            jnp.stack([s, zeros, -s * mx], axis=-1),
            jnp.stack([zeros, s, -s * my], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return xn, T


def _solve_epipolar_lstsq(x0n: jnp.ndarray, x1n: jnp.ndarray, w: jnp.ndarray):
    """Least-squares epipolar constraint: rows a_i = kron(x1h, x0h); the
    null vector of the 9x9 A^T A comes from shifted inverse iteration
    (batched, eigh-free — see core.triangulate.smallest_eigvec_sym)."""
    ones = jnp.ones(x0n.shape[:-1] + (1,), dtype=x0n.dtype)
    p0 = jnp.concatenate([x0n, ones], axis=-1)  # (..., N, 3)
    p1 = jnp.concatenate([x1n, ones], axis=-1)
    A = (p1[..., :, None] * p0[..., None, :]).reshape(*x0n.shape[:-1], 9)
    A = A * w[..., None]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    from .triangulate import smallest_eigvec_sym

    f = smallest_eigvec_sym(AtA, iters=8)
    return f.reshape(*f.shape[:-1], 3, 3)


def _enforce_rank2(F: jnp.ndarray) -> jnp.ndarray:
    U, S, Vt = jnp.linalg.svd(F)
    S2 = S.at[..., 2].set(0.0)
    return U @ (S2[..., :, None] * Vt)


def _enforce_essential(E: jnp.ndarray) -> jnp.ndarray:
    """Project onto the essential manifold: singular values -> (s, s, 0)."""
    U, S, Vt = jnp.linalg.svd(E)
    s = (S[..., 0] + S[..., 1]) * 0.5
    S2 = jnp.stack([s, s, jnp.zeros_like(s)], axis=-1)
    return U @ (S2[..., :, None] * Vt)


def fundamental_8pt(x0: jnp.ndarray, x1: jnp.ndarray, w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normalized 8-point fundamental matrix. x0, x1: (..., N>=8, 2) pixels.
    Returns F (..., 3, 3) with x1h^T F x0h = 0."""
    if w is None:
        w = jnp.ones(x0.shape[:-1], dtype=x0.dtype)
    x0n, T0 = _normalize_points(x0, w)
    x1n, T1 = _normalize_points(x1, w)
    Fn = _solve_epipolar_lstsq(x0n, x1n, w)
    Fn = _enforce_rank2(Fn)
    F = jnp.swapaxes(T1, -1, -2) @ Fn @ T0
    norm = jnp.linalg.norm(F.reshape(*F.shape[:-2], 9), axis=-1)[..., None, None]
    return F / jnp.maximum(norm, 1e-12)


def essential_8pt(x0n: jnp.ndarray, x1n: jnp.ndarray, w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Essential matrix from >= 8 normalized-coordinate correspondences,
    projected onto the essential manifold. Returns E with x1h^T E x0h = 0."""
    if w is None:
        w = jnp.ones(x0n.shape[:-1], dtype=x0n.dtype)
    x0h, T0 = _normalize_points(x0n, w)
    x1h, T1 = _normalize_points(x1n, w)
    En = _solve_epipolar_lstsq(x0h, x1h, w)
    E = jnp.swapaxes(T1, -1, -2) @ En @ T0
    E = _enforce_essential(E)
    norm = jnp.linalg.norm(E.reshape(*E.shape[:-2], 9), axis=-1)[..., None, None]
    return E / jnp.maximum(norm, 1e-12)


def sampson_error(F: jnp.ndarray, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) error of x1^T F x0.  F: (..., 3, 3),
    x0/x1: (..., N, 2).  Returns (..., N) squared errors — the RANSAC score
    (OpenMVG's AC-RANSAC scores a closely related residual)."""
    ones = jnp.ones(x0.shape[:-1] + (1,), dtype=x0.dtype)
    p0 = jnp.concatenate([x0, ones], axis=-1)
    p1 = jnp.concatenate([x1, ones], axis=-1)
    Fx0 = jnp.einsum("...ij,...nj->...ni", F, p0)
    Ftx1 = jnp.einsum("...ji,...nj->...ni", F, p1)
    num = jnp.einsum("...ni,...ni->...n", p1, Fx0)
    denom = Fx0[..., 0] ** 2 + Fx0[..., 1] ** 2 + Ftx1[..., 0] ** 2 + Ftx1[..., 1] ** 2
    return num * num / jnp.maximum(denom, 1e-12)


def epipolar_distance(F: jnp.ndarray, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """Symmetric point-to-epipolar-line squared distance."""
    ones = jnp.ones(x0.shape[:-1] + (1,), dtype=x0.dtype)
    p0 = jnp.concatenate([x0, ones], axis=-1)
    p1 = jnp.concatenate([x1, ones], axis=-1)
    l1 = jnp.einsum("...ij,...nj->...ni", F, p0)  # line in image 1
    l0 = jnp.einsum("...ji,...nj->...ni", F, p1)  # line in image 0
    s = jnp.einsum("...ni,...ni->...n", p1, l1)
    d1 = s * s / jnp.maximum(l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12)
    d0 = s * s / jnp.maximum(l0[..., 0] ** 2 + l0[..., 1] ** 2, 1e-12)
    return 0.5 * (d0 + d1)


def decompose_essential(E: jnp.ndarray):
    """E -> the four (R, t) candidates (R1,t), (R1,-t), (R2,t), (R2,-t).
    Returns (R: (..., 4, 3, 3), t: (..., 4, 3)) with unit-norm t."""
    U, _, Vt = jnp.linalg.svd(E)
    # Make proper rotations.
    detU = jnp.linalg.det(U)
    detVt = jnp.linalg.det(Vt)
    U = U * jnp.where(detU < 0, -1.0, 1.0)[..., None, None]
    Vt = Vt * jnp.where(detVt < 0, -1.0, 1.0)[..., None, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def recover_pose(E: jnp.ndarray, x0n: jnp.ndarray, x1n: jnp.ndarray, w: jnp.ndarray | None = None):
    """Choose the (R, t) candidate with maximal cheirality support
    (parity: cv::recoverPose, src/actuator/SequentialActuator.h:114).

    x0n, x1n: (N, 2) normalized coords (camera 0 is identity).  Returns
    (R, t, n_good, front_mask) where (R, t) maps camera-0 frame to camera-1.
    """
    from .triangulate import triangulate_two_view

    if w is None:
        w = jnp.ones(x0n.shape[:-1], dtype=x0n.dtype)
    Rs, ts = decompose_essential(E)  # (4,3,3), (4,3)
    P0 = jnp.concatenate([jnp.eye(3, dtype=E.dtype), jnp.zeros((3, 1), dtype=E.dtype)], axis=1)

    def count_front(R, t):
        P1 = jnp.concatenate([R, t[:, None]], axis=1)
        X = triangulate_two_view(P0, P1, x0n, x1n)  # (N, 3)
        z0 = X[..., 2]
        z1 = jnp.einsum("j,nj->n", R[2], X) + t[2]
        # Reasonable-depth guard mirrors recoverPose's distanceThresh.
        front = (z0 > 1e-4) & (z1 > 1e-4) & (z0 < 1e4)
        return jnp.sum(front * w), front, X

    counts, fronts, Xs = [], [], []
    for i in range(4):
        c, f, X = count_front(Rs[i], ts[i])
        counts.append(c)
        fronts.append(f)
        Xs.append(X)
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    R = Rs[best]
    t = ts[best]
    front = jnp.stack(fronts)[best]
    X = jnp.stack(Xs)[best]
    return R, t, counts[best], front, X
