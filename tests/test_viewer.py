"""Self-contained viewer artifact (parity: WorldStructure::show,
src/world/WorldStructure.h:108-155)."""

import base64

import numpy as np

from tpusfm.io import viewer


def test_viewer_embeds_scene(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (500, 3)).astype(np.uint8)
    R = np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))
    centers = np.array([[0, 0, -5], [1, 0, -5], [2, 0, -5]], np.float32)
    out = viewer.write_viewer_html(tmp_path / "viewer.html", pts, cols,
                                   cam_rotations=R, cam_centers=centers)
    html = out.read_text()
    # Fully self-contained: no external script/style references.
    assert "http://" not in html and "https://" not in html
    assert "<script>" in html and "webgl" in html
    # The embedded point payload decodes back to the cloud.
    b64 = html.split('PTS_B64="')[1].split('"')[0]
    back = np.frombuffer(base64.b64decode(b64), np.float32).reshape(-1, 3)
    np.testing.assert_allclose(back, pts)
    # Camera frusta lines present (8 segments x 2 endpoints per camera).
    cam_b64 = html.split('CAM_B64="')[1].split('"')[0]
    lines = np.frombuffer(base64.b64decode(cam_b64), np.float32).reshape(-1, 3)
    assert len(lines) == 3 * 16


def test_viewer_handles_nan_and_empty(tmp_path):
    pts = np.array([[0, 0, 1], [np.nan, 0, 0], [1, 1, 1]], np.float32)
    out = viewer.write_viewer_html(tmp_path / "v.html", pts)
    b64 = out.read_text().split('PTS_B64="')[1].split('"')[0]
    back = np.frombuffer(base64.b64decode(b64), np.float32).reshape(-1, 3)
    assert len(back) == 2  # NaN row dropped
    out2 = viewer.write_viewer_html(tmp_path / "v2.html",
                                    np.zeros((0, 3), np.float32))
    assert out2.exists()
