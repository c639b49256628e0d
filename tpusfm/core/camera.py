"""Camera models: pinhole and pinhole + 3-coefficient radial distortion.

Capability parity with the reference's default intrinsic model
``PINHOLE_CAMERA_RADIAL3`` (src/sparseBuilder/sparseBuilder.cpp:320,480-502) and
the hand-rolled pinhole transforms (src/component/Camera.h:38-96).

Intrinsics are a flat parameter vector so bundle adjustment can treat them as a
dense block (like the reference's 4-param fx,fy,cx,cy block,
src/adjuster/BundleAdjuster.h:82-90, extended with k1,k2,k3):

    intr = [fx, fy, cx, cy, k1, k2, k3]        shape (..., 7)

A plain pinhole camera is the same vector with k = 0.  All functions broadcast
over leading batch dimensions and are jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

FX, FY, CX, CY, K1, K2, K3 = range(7)
NUM_INTR = 7


def make_intrinsics(fx, fy=None, cx=0.0, cy=0.0, k1=0.0, k2=0.0, k3=0.0) -> jnp.ndarray:
    fy = fx if fy is None else fy
    return jnp.asarray([fx, fy, cx, cy, k1, k2, k3], dtype=jnp.float32)


def k_matrix(intr: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) -> 3x3 K matrix (ref: src/component/Camera.h:85-90)."""
    fx, fy, cx, cy = intr[..., FX], intr[..., FY], intr[..., CX], intr[..., CY]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    return jnp.stack(
        [
            jnp.stack([fx, zeros, cx], axis=-1),
            jnp.stack([zeros, fy, cy], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )


def distort_radial(intr: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply radial distortion to normalized coords xn (..., 2)."""
    r2 = jnp.sum(xn * xn, axis=-1, keepdims=True)
    k1 = intr[..., K1, None]
    k2 = intr[..., K2, None]
    k3 = intr[..., K3, None]
    scale = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    return xn * scale


def undistort_radial(intr: jnp.ndarray, xd: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Invert radial distortion by fixed-point iteration (static trip count,
    XLA-friendly in place of a data-dependent convergence loop)."""
    xn = xd
    for _ in range(iters):
        r2 = jnp.sum(xn * xn, axis=-1, keepdims=True)
        k1 = intr[..., K1, None]
        k2 = intr[..., K2, None]
        k3 = intr[..., K3, None]
        scale = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xn = xd / jnp.maximum(scale, 1e-8)
    return xn


def _resolve_model(intr: jnp.ndarray, model: str) -> str:
    """"auto" dispatches on the intrinsic vector width: 7 lanes = RADIAL3
    (the reference's wired default), 9 lanes = Brown-T2 (the superset model
    [fx,fy,cx,cy,k1,k2,k3,t1,t2]; t = 0 reproduces RADIAL3 exactly).
    Fisheye/spherical must be named explicitly — their lane meanings differ
    (fisheye: lanes 4..7 are theta-polynomial k1..k4; spherical:
    equirectangular, lanes 4+ unused)."""
    if model != "auto":
        return model
    return "brown" if intr.shape[-1] >= 9 else "radial3"


def camera_to_pixel(intr: jnp.ndarray, x_cam: jnp.ndarray, eps: float = 1e-8,
                    model: str = "auto") -> jnp.ndarray:
    """Project camera-frame points (..., 3) to pixels (..., 2).

    Perspective divide -> distortion -> focal/principal point
    (ref: src/component/Camera.h:56-63 for pinhole; model factory parity
    with src/sparseBuilder/sparseBuilder.cpp:484-497: PINHOLE / RADIAL1 /
    RADIAL3 subsume into the 7-vector, BROWN into the 9-vector, FISHEYE /
    SPHERICAL by explicit `model`)."""
    model = _resolve_model(intr, model)
    f = jnp.stack([intr[..., FX], intr[..., FY]], axis=-1)
    c = jnp.stack([intr[..., CX], intr[..., CY]], axis=-1)
    if model == "spherical":
        # Equirectangular: u = fx * azimuth + cx, v = fy * elevation + cy
        # (OpenMVG Intrinsic_Spherical bearing semantics).
        x, y, z = x_cam[..., 0], x_cam[..., 1], x_cam[..., 2]
        nrm = jnp.sqrt(jnp.maximum(x * x + y * y + z * z, eps * eps))
        az = jnp.arctan2(x, z)
        el = jnp.arcsin(jnp.clip(y / nrm, -1.0, 1.0))
        return jnp.stack([az, el], axis=-1) * f + c
    z = x_cam[..., 2:3]
    xn = x_cam[..., :2] / jnp.where(jnp.abs(z) < eps, jnp.sign(z) * eps + (z == 0) * eps, z)
    if model == "fisheye":
        from . import distortion

        xd = distortion.distort_fisheye(intr[..., 4:8], xn)
    elif model == "brown":
        from . import distortion

        xd = distortion.distort_brown(intr[..., 4:9], xn)
    else:  # pinhole / radial1 / radial3 via the k coefficients
        xd = distort_radial(intr, xn)
    return xd * f + c


def pixel_to_normal(intr: jnp.ndarray, uv: jnp.ndarray, undistort: bool = True,
                    model: str = "auto") -> jnp.ndarray:
    """Pixels (..., 2) -> undistorted normalized camera coords (..., 2)
    (ref: src/component/Camera.h:44-49 pixel2normal)."""
    model = _resolve_model(intr, model)
    f = jnp.stack([intr[..., FX], intr[..., FY]], axis=-1)
    c = jnp.stack([intr[..., CX], intr[..., CY]], axis=-1)
    xd = (uv - c) / f
    if not undistort:
        return xd
    if model == "spherical":
        # Bearing angles -> tangent-plane normalized coords (valid for the
        # forward-hemisphere geometry the SfM stages consume).
        az, el = xd[..., 0], xd[..., 1]
        tx = jnp.tan(az)
        ty = jnp.tan(el) / jnp.maximum(jnp.cos(az), 1e-6)
        return jnp.stack([tx, ty], axis=-1)
    if model == "fisheye":
        from . import distortion

        return distortion.undistort_fisheye(intr[..., 4:8], xd)
    if model == "brown":
        from . import distortion

        return distortion.undistort_brown(intr[..., 4:9], xd)
    return undistort_radial(intr, xd)


def project(intr: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, x_world: jnp.ndarray) -> jnp.ndarray:
    """Full world -> pixel projection (ref: Camera.h world2pixel path)."""
    x_cam = jnp.einsum("...ij,...j->...i", R, x_world) + t
    return camera_to_pixel(intr, x_cam)


def in_front(R: jnp.ndarray, t: jnp.ndarray, x_world: jnp.ndarray) -> jnp.ndarray:
    """Cheirality test: positive depth in the camera frame."""
    z = jnp.einsum("...j,...j->...", R[..., 2, :], x_world) + t[..., 2]
    return z > 0.0
