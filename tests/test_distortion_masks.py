"""Brown/fisheye distortion transforms (intrinsic-factory parity,
reference sparseBuilder.cpp:469-502) and feature-mask support in the SIFT
detector (detectFeature mask parity, .cpp:701-740)."""

import numpy as np
import jax.numpy as jnp

from tpusfm.core import distortion


class TestBrown:
    def test_round_trip(self):
        rng = np.random.default_rng(0)
        params = jnp.asarray([-0.2, 0.05, -0.01, 1e-3, -2e-3], jnp.float32)
        xn = jnp.asarray(rng.uniform(-0.6, 0.6, size=(200, 2)), jnp.float32)
        xd = distortion.distort_brown(params, xn)
        back = distortion.undistort_brown(params, xd)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xn), atol=1e-4)

    def test_zero_params_identity(self):
        xn = jnp.asarray([[0.3, -0.2]], jnp.float32)
        xd = distortion.distort_brown(jnp.zeros(5), xn)
        np.testing.assert_allclose(np.asarray(xd), np.asarray(xn), atol=1e-7)


class TestFisheye:
    def test_round_trip(self):
        rng = np.random.default_rng(1)
        params = jnp.asarray([0.02, -0.005, 0.001, -2e-4], jnp.float32)
        xn = jnp.asarray(rng.uniform(-0.8, 0.8, size=(200, 2)), jnp.float32)
        xd = distortion.distort_fisheye(params, xn)
        back = distortion.undistort_fisheye(params, xd)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xn), atol=1e-4)

    def test_matches_cv2_fisheye(self):
        import cv2

        rng = np.random.default_rng(2)
        k = np.array([0.05, -0.01, 0.002, -1e-4])
        pts = rng.uniform(-0.5, 0.5, size=(50, 2))
        # cv2.fisheye.distortPoints expects normalized coords with K=I.
        cv_out = cv2.fisheye.distortPoints(
            pts[None].astype(np.float64), np.eye(3), k.reshape(4, 1)
        )[0]
        ours = np.asarray(distortion.distort_fisheye(
            jnp.asarray(k, jnp.float32), jnp.asarray(pts, jnp.float32)
        ))
        np.testing.assert_allclose(ours, cv_out, atol=1e-4)


class TestFactory:
    def test_dispatch_all_models(self):
        xd = jnp.asarray([[0.2, 0.1]], jnp.float32)
        for model, params in [
            ("pinhole", None),
            ("radial1", jnp.asarray([-0.1], jnp.float32)),
            ("radial3", jnp.asarray([-0.1, 0.01, 0.0], jnp.float32)),
            ("brown", jnp.asarray([-0.1, 0.01, 0.0, 1e-3, 0.0], jnp.float32)),
            ("fisheye", jnp.asarray([0.01, 0.0, 0.0, 0.0], jnp.float32)),
        ]:
            out = distortion.undistort_to_pinhole(model, params, xd)
            assert np.isfinite(np.asarray(out)).all(), model

    def test_unknown_model_raises(self):
        import pytest

        with pytest.raises(ValueError):
            distortion.undistort_to_pinhole("spline", None, jnp.zeros((1, 2)))


class TestDetectionMasks:
    def test_mask_excludes_region(self):
        from tpusfm.features.sift import detect_and_describe, SiftConfig
        from tpusfm.utils.synth_render import render_orbit_images

        images, _ = render_orbit_images(n_views=1, img_h=240, img_w=320)
        cfg = SiftConfig(n_octaves=3, max_features=512, max_per_octave=256)
        img = jnp.asarray(images[:1])

        full = detect_and_describe(img, cfg)
        masks = np.ones((1, 240, 320), np.float32)
        masks[:, :, 160:] = 0.0  # kill the right half
        masked = detect_and_describe(img, cfg, jnp.asarray(masks))

        kp = np.asarray(masked.kp[0])
        ok = np.asarray(masked.mask[0])
        assert ok.sum() > 10  # left half still has features
        assert (kp[ok, 0] < 160.5).all()  # none on the masked half
        # Masking can only remove features.
        assert ok.sum() < np.asarray(full.mask[0]).sum()
