"""Degenerate-input behavior: the pipeline must degrade gracefully, never
crash or emit NaNs (the reference's only guard is the ensure() crash macro,
common.h:13-23 — we do strictly better)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusfm.features import sift
from tpusfm.pipeline.config import config_from_overrides
from tpusfm.pipeline.sparse import run_sparse
from tpusfm.utils.synth_render import render_orbit_images


def _small_cfg():
    return config_from_overrides(**{
        "sift.n_octaves": 3, "sift.max_per_octave": 256,
        "sift.max_features": 384, "filter.max_iterations": 64,
    })


def test_featureless_images_no_crash():
    """Uniform images yield no keypoints; the pipeline reports an empty
    reconstruction instead of crashing."""
    images = np.full((4, 120, 160), 0.5, np.float32)
    intr = np.array([150.0, 150.0, 80.0, 60.0, 0, 0, 0], np.float32)
    scene, report = run_sparse(images, intr, _small_cfg(),
                               key=jax.random.PRNGKey(0))
    assert report["n_points"] == 0 or report["n_registered"] <= 2
    assert np.isfinite(np.asarray(scene.points)[np.asarray(scene.point_mask)]).all()


def test_duplicate_images_zero_baseline():
    """All views identical (zero baseline): triangulation is impossible;
    no NaN poses or points may escape."""
    one, gt = render_orbit_images(n_views=1, img_h=120, img_w=160,
                                  focal=0.9 * 160, arc_deg=1.0, seed=3)
    images = np.repeat(one, 5, axis=0)
    scene, report = run_sparse(images, gt["intr"], _small_cfg(),
                               key=jax.random.PRNGKey(1))
    pm = np.asarray(scene.point_mask)
    assert np.isfinite(np.asarray(scene.points)[pm]).all()
    assert np.isfinite(np.asarray(scene.cam_t)[np.asarray(scene.cam_mask)]).all()


def test_sift_on_constant_image_emits_nothing():
    img = jnp.full((1, 96, 128), 0.25, jnp.float32)
    cfg = sift.SiftConfig(n_octaves=3, max_per_octave=128, max_features=128)
    out = sift.detect_and_describe(img, cfg)
    assert int(out.n_valid[0]) == 0
    assert np.isfinite(np.asarray(out.desc)).all()


def test_sift_on_extreme_contrast():
    """Saturated checkerboard: many extrema, values stay finite and inside
    capacity."""
    y, x = np.mgrid[0:96, 0:128]
    img = jnp.asarray(((y // 8 + x // 8) % 2).astype(np.float32)[None])
    cfg = sift.SiftConfig(n_octaves=3, max_per_octave=256, max_features=256)
    out = sift.detect_and_describe(img, cfg)
    assert int(out.n_valid[0]) <= 256
    d = np.asarray(out.desc[0])
    assert np.isfinite(d).all() and d.min() >= 0.0 and d.max() <= 255.0


def test_two_views_only():
    """Minimum viable reconstruction (config 1 of BASELINE.md)."""
    images, gt = render_orbit_images(n_views=2, img_h=240, img_w=320,
                                     focal=0.9 * 320, arc_deg=14.0, seed=4)
    scene, report = run_sparse(images, gt["intr"], _small_cfg(),
                               key=jax.random.PRNGKey(2))
    assert report["n_registered"] == 2
    assert report["n_points"] > 20
    err = np.asarray(scene.reprojection_errors())
    msk = np.asarray(scene.obs_mask)
    assert err[msk].mean() < 2.0
