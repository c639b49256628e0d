"""Fused two-view reconstruction program (the driver's entry() target) and
the Result utility."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusfm.core import camera
from tpusfm.features import sift
from tpusfm.sfm.two_view import two_view_reconstruct
from tpusfm.utils.result import Result, ensure
from tpusfm.utils.synth_render import render_orbit_images


def test_two_view_reconstruct_end_to_end():
    images, gt = render_orbit_images(
        n_views=2, img_h=240, img_w=320, focal=0.9 * 320, arc_deg=10.0, seed=3
    )
    cfg = sift.SiftConfig(n_octaves=3, max_per_octave=512, max_features=768)
    intr = camera.make_intrinsics(0.9 * 320, cx=160.0, cy=120.0)
    out = two_view_reconstruct(
        jnp.asarray(images), intr, jax.random.PRNGKey(0),
        sift_cfg=cfg, ransac_iters=256,
    )
    n_inl = int(out["n_inliers"])
    assert n_inl > 40, f"only {n_inl} inliers of {int(out['n_matches'])} matches"
    # Relative rotation matches ground truth (R_rel = R1 R0^T).
    R_rel_gt = gt["R"][1] @ gt["R"][0].T
    err = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(out["R"]) @ R_rel_gt.T) - 1) / 2, -1, 1)))
    assert err < 2.0, f"relative rotation error {err:.2f} deg"
    # Triangulated inliers are in front of both cameras.
    X = np.asarray(out["points"])[np.asarray(out["inliers"])]
    assert (X[:, 2] > 0).mean() > 0.95


def test_result_utility():
    ok = Result.ok(42)
    assert ok.is_ok and ok.unwrap() == 42 and ok.unwrap_or(0) == 42
    err = Result.err("boom")
    assert err.is_err and err.error == "boom" and err.unwrap_or(7) == 7
    with pytest.raises(RuntimeError):
        err.unwrap()
    ensure(True)
    with pytest.raises(AssertionError):
        ensure(False, "nope")
