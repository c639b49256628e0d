"""Full-image undistortion remap (ops/image.undistort_image) — the ideal-
pinhole resampling the reference gets from `openMVG2openMVS -d
undistorted_images` (src/main.cpp:157-158)."""

import jax.numpy as jnp
import numpy as np

from tpusfm.core import camera
from tpusfm.ops.image import undistort_image


def _pattern(px, py):
    return 0.5 + 0.25 * np.sin(px * 0.11) + 0.25 * np.cos(py * 0.07)


def test_identity_when_undistorted():
    rng = np.random.default_rng(0)
    img = rng.random((60, 80), np.float32)
    intr = camera.make_intrinsics(100.0, 100.0, 40.0, 30.0)
    out = np.asarray(undistort_image(jnp.asarray(img), intr))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_undistort_recovers_ideal_pattern():
    h, w = 120, 160
    intr = camera.make_intrinsics(120.0, 120.0, w / 2, h / 2, k1=-0.25, k2=0.05)

    # Captured (distorted) image: pixel q sees the scene ray whose ideal
    # pixel is p(q) = K undistort(K^-1 q).
    qy, qx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    q = jnp.asarray(np.stack([qx, qy], axis=-1))
    p = np.asarray(camera.undistort_radial(intr, camera.pixel_to_normal(intr, q, undistort=False))
                   * jnp.asarray([120.0, 120.0]) + jnp.asarray([w / 2, h / 2]))
    captured = _pattern(p[..., 0], p[..., 1]).astype(np.float32)

    out = np.asarray(undistort_image(jnp.asarray(captured), intr))
    ideal = _pattern(qx, qy)

    # Compare in the interior (borders hit fill / edge clamping).
    sl = np.s_[20:-20, 20:-20]
    assert np.abs(out[sl] - ideal[sl]).max() < 0.02


def test_rgb_and_fill():
    h, w = 50, 70
    # Pincushion (k1 > 0): corners of the ideal grid sample outside the
    # captured frame and must be filled.
    intr = camera.make_intrinsics(40.0, 40.0, w / 2, h / 2, k1=0.5)
    img = np.ones((h, w, 3), np.float32)
    out = np.asarray(undistort_image(jnp.asarray(img), intr, fill=-1.0))
    assert out.shape == (h, w, 3)
    assert out[0, 0, 0] == -1.0      # corner out of bounds
    assert out[h // 2, w // 2, 1] == 1.0
