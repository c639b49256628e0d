"""End-to-end two-view reconstruction as ONE jitted array program.

BASELINE.md config 1: SIFT detect + match on an image pair -> essential
matrix (batched RANSAC) -> pose recovery -> triangulation -> point cloud.
Semantics parity with ``SequentialActuator::init``
(src/actuator/SequentialActuator.h:85-136), but where the reference chains
OpenCV calls on the host, here the whole chain — pyramid, detection,
descriptors, distance matmul, ratio test, RANSAC, SVD pose, DLT — is a
single XLA graph with fixed capacities, so it fuses and stays on-chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core import epipolar
from ..features import sift
from ..matching import match
from . import ransac as ransac_mod


@partial(jax.jit, static_argnames=("sift_cfg", "ransac_iters", "ratio"))
def two_view_reconstruct(
    images: jnp.ndarray,      # (2, H, W) float32 [0,1] or uint8
    intr: jnp.ndarray,        # (7,) shared intrinsics
    key: jax.Array,
    sift_cfg: sift.SiftConfig = sift.SiftConfig(),
    ransac_iters: int = 512,
    ratio: float = 0.8,
    thresh_px: float = 4.0,
):
    """Returns a dict with the relative pose (R, t), triangulated points,
    matched pixel coordinates, and masks.  Camera 0 is the identity."""
    feats = sift.detect_and_describe(images, sift_cfg)
    idx, valid = match.match_descriptors(
        feats.desc[0], feats.desc[1], feats.mask[0], feats.mask[1], ratio=ratio
    )
    uv0, uv1, valid = match.gather_matched_points(feats.kp[0], feats.kp[1], idx, valid)
    x0n = cam.pixel_to_normal(intr, uv0)
    x1n = cam.pixel_to_normal(intr, uv1)
    f = 0.5 * (intr[0] + intr[1])
    E, inl, n_inl = ransac_mod.ransac(
        key, x0n, x1n, valid,
        solver=epipolar.essential_8pt,
        scorer=epipolar.sampson_error,
        sample_size=8, n_iters=ransac_iters,
        inlier_thresh=thresh_px / f,
    )
    R, t, n_good, front, X = epipolar.recover_pose(E, x0n, x1n, w=inl.astype(x0n.dtype))
    good = inl & front & valid
    return {
        "R": R,
        "t": t,
        "E": E,
        "points": X,
        "uv0": uv0,
        "uv1": uv1,
        "match_idx": idx,
        "inliers": good,
        "n_inliers": jnp.sum(good),
        "n_matches": jnp.sum(valid),
        "features": feats,
    }
