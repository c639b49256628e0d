"""A-contrario RANSAC (AC-RANSAC/ORSA parity with OpenMVG's filter,
reference sparseBuilder.cpp:1160-1237): the inlier threshold must adapt to
the data's noise level without any knob, and non-meaningful models (pure
outlier sets) must be rejected via the NFA test."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusfm.core import epipolar
from tpusfm.sfm.ransac import ransac_ac


def _make_pair(rng, noise_px, n=300, n_out=100):
    from scipy.spatial.transform import Rotation

    K = np.array([[800, 0, 320], [0, 800, 240], [0, 0, 1.0]])
    R = Rotation.from_rotvec(rng.normal(size=3) * 0.3).as_matrix()
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    X = rng.uniform(-2, 2, size=(n, 3))
    X[:, 2] += 6
    h0 = np.concatenate([X[:, :2] / X[:, 2:3], np.ones((n, 1))], 1) @ K.T
    Xc = X @ R.T + t
    h1 = np.concatenate([Xc[:, :2] / Xc[:, 2:3], np.ones((n, 1))], 1) @ K.T
    x0 = np.array(h0[:, :2]) + rng.normal(size=(n, 2)) * noise_px
    x1 = np.array(h1[:, :2]) + rng.normal(size=(n, 2)) * noise_px
    x1[:n_out] = rng.uniform((0, 0), (640, 480), size=(n_out, 2))
    return x0, x1


_ALPHA0 = 2.0 * np.hypot(640, 480) / (640 * 480)


def _run(x0, x1, key=None):
    key = jax.random.PRNGKey(0) if key is None else key
    return ransac_ac(
        key,
        jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32),
        jnp.ones(len(x0), bool),
        solver=epipolar.fundamental_8pt, scorer=epipolar.sampson_error,
        sample_size=8, n_iters=256, error_dim=1, alpha0=_ALPHA0,
        max_thresh=16.0,
    )


class TestAdaptiveThreshold:
    def test_threshold_tracks_noise(self):
        rng = np.random.default_rng(3)
        eps_by_noise = []
        for noise in (0.3, 3.0):
            eps_vals = []
            for _ in range(3):
                x0, x1 = _make_pair(rng, noise)
                _, inl, n_inl, lognfa, eps = _run(x0, x1)
                eps_vals.append(float(eps))
                assert 150 <= int(n_inl) <= 220  # ~200 true inliers
                assert float(lognfa) < 0  # meaningful
            eps_by_noise.append(np.median(eps_vals))
        # Higher noise -> proportionally larger adaptive threshold.
        assert eps_by_noise[1] > 3.0 * eps_by_noise[0]
        assert eps_by_noise[0] < 2.0  # tight for clean data

    def test_pure_outliers_rejected(self):
        rng = np.random.default_rng(4)
        x0 = rng.uniform((0, 0), (640, 480), size=(200, 2))
        x1 = rng.uniform((0, 0), (640, 480), size=(200, 2))
        _, inl, n_inl, lognfa, eps = _run(x0, x1)
        # No statistically meaningful epipolar geometry in random noise:
        # support must be empty (NFA > 1).
        assert int(n_inl) == 0

    def test_validity_mask_respected(self):
        rng = np.random.default_rng(5)
        x0, x1 = _make_pair(rng, 0.5)
        valid = np.ones(len(x0), bool)
        valid[150:] = False
        _, inl, n_inl, _, _ = ransac_ac(
            jax.random.PRNGKey(1),
            jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32),
            jnp.asarray(valid),
            solver=epipolar.fundamental_8pt, scorer=epipolar.sampson_error,
            sample_size=8, n_iters=128, error_dim=1, alpha0=_ALPHA0,
            max_thresh=16.0,
        )
        assert not np.asarray(inl)[150:].any()


class TestPipelineAdaptive:
    def test_filter_pairs_adaptive(self):
        """filter_pairs with cfg.filter.adaptive=True on a rendered scene."""
        from tpusfm.pipeline.config import config_from_overrides
        from tpusfm.pipeline.sparse import (
            detect_features, generate_pairs, match_pairs, filter_pairs,
        )
        from tpusfm.utils.synth_render import render_orbit_images

        images, gt = render_orbit_images(n_views=4, img_h=240, img_w=320)
        cfg = config_from_overrides(**{
            "filter.adaptive": True,
            "sift.n_octaves": 3, "sift.max_features": 512,
            "sift.max_per_octave": 256, "matching.pair_chunk": 8,
        })
        feats = detect_features(images, cfg)
        pair_list = generate_pairs(images.shape[0], cfg)
        mi, mv = match_pairs(feats, pair_list, cfg)
        mi2, mv2, ok = filter_pairs(
            feats, pair_list, mi, mv, cfg, img_hw=images.shape[1:3]
        )
        # Filtering only removes matches, never adds.
        assert (mv2 & ~mv).sum() == 0
        # Same pairs survive as under the fixed-threshold filter, and the
        # adaptive filter keeps nearly all of its inliers on this clean
        # rendered scene (no knob was tuned for it).
        from tpusfm.pipeline.config import PipelineConfig
        import dataclasses

        cfg_fixed = dataclasses.replace(
            cfg, filter=dataclasses.replace(cfg.filter, adaptive=False)
        )
        _, mv_f, ok_f = filter_pairs(
            feats, pair_list, mi, mv, cfg_fixed, img_hw=images.shape[1:3]
        )
        assert (ok == ok_f).all()
        assert mv2[ok].sum() >= 0.9 * mv_f[ok_f].sum()
