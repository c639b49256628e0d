"""Image I/O tests: native C++ ingest vs PIL, EXIF focal priors."""

import numpy as np
import pytest
from PIL import Image

from tpusfm.io import images as im_io
from tpusfm.io import native_ingest


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    arrs = []
    for i, fmt in enumerate(["PNG", "JPEG", "BMP", "PPM"]):
        arr = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.{fmt.lower()}", format=fmt)
        arrs.append(arr)
    return d, arrs


def test_list_images_sorted(image_dir):
    d, _ = image_dir
    paths = im_io.list_images(d)
    assert len(paths) == 4
    assert [p.name for p in paths] == sorted(p.name for p in paths)


def test_native_ingest_matches_pil(image_dir):
    d, _ = image_dir
    if not native_ingest.available():
        pytest.skip("native ingest library not built (no compiler?)")
    paths = im_io.list_images(d)
    gray, rgb, status = native_ingest.load_batch(paths, 128, 96, gray=True, rgb=True)
    assert status.all()
    for i, p in enumerate(paths):
        ref_rgb = np.asarray(Image.open(p).convert("RGB"))
        # JPEG is lossy on disk, but both decoders read the same file.
        assert np.abs(rgb[i].astype(int) - ref_rgb.astype(int)).max() <= 1
        ref_gray = np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
        assert np.abs(gray[i] - ref_gray).max() < 0.01


def test_load_images_gray_uses_some_path(image_dir):
    d, _ = image_dir
    out = im_io.load_images_gray(im_io.list_images(d))
    assert out.shape == (4, 96, 128)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_focal_prior_fallbacks(image_dir):
    d, _ = image_dir
    rec = im_io.read_image_record(im_io.list_images(d)[0])
    # No EXIF -> FOV-based default focal.
    assert rec.focal_px is not None and rec.focal_px > 50
    rec2 = im_io.read_image_record(im_io.list_images(d)[0], focal_prior_px=2905.88)
    assert rec2.focal_px == pytest.approx(2905.88)


def test_sensor_db_focal():
    # Synthetic: focal = max(w,h) * f_mm / ccd_mm (sparseBuilder.cpp:455).
    db = im_io.load_sensor_db(None)
    assert db["nikon d850"] == pytest.approx(35.9)
