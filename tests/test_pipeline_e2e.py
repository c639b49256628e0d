"""End-to-end: rendered images -> full sparse pipeline -> ATE vs ground
truth (BASELINE.md config ladder, scaled down for the CPU test mesh)."""

import numpy as np
import pytest

from tpusfm.pipeline.config import config_from_overrides
from tpusfm.pipeline.sparse import run_sparse
from tpusfm.utils import metrics
from tpusfm.utils.synth_render import render_orbit_images


@pytest.fixture(scope="module")
def small_cfg():
    return config_from_overrides(**{
        "sift.n_octaves": 3,
        "sift.max_per_octave": 512,
        "sift.max_features": 768,
        "matching.pair_chunk": 16,
        "filter.max_iterations": 128,
        "feature_batch": 3,
    })


def test_sparse_pipeline_end_to_end(small_cfg):
    images, gt = render_orbit_images(
        n_views=6, img_h=240, img_w=320, focal=0.9 * 320, arc_deg=60.0, seed=1
    )
    events = []
    scene, report = run_sparse(
        images, gt["intr"], small_cfg,
        progress=lambda t, p, **kw: events.append((t, p)),
    )
    reg = np.asarray(scene.cam_mask)
    assert reg.sum() >= 5, f"registered {reg.sum()}/6; log: {report['engine_log']}"
    centers = np.asarray(scene.camera_centers())[reg]
    ate = metrics.ate_rmse(centers, gt["centers"][reg])
    # Scene radius is 8.0 — require ATE under 1% of it.
    assert ate < 0.08, f"ATE {ate}; log: {report['engine_log']}"
    assert report["n_points"] > 50
    # Progress events cover every stage in order with terminal 1.0.
    stages = [t for t, _ in events]
    for st in ("preprocessing", "matching", "filtering", "reconstruction", "done"):
        assert st in stages, f"missing progress events for {st}"
    # Colorization produced non-trivial colors for active points.
    cols = np.asarray(scene.colors)[np.asarray(scene.point_mask)]
    assert cols.std() > 1.0
