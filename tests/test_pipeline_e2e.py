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


def test_essential_filter_model(small_cfg):
    """Model 'e' (essential-manifold filter with intrinsics) keeps the
    well-conditioned adjacent pairs (parity: ESSENTIAL_MATRIX option)."""
    import dataclasses
    import numpy as np
    from tpusfm.pipeline import sparse as sp
    from tpusfm.pipeline.config import GeometricFilterConfig

    images, gt = render_orbit_images(
        n_views=5, img_h=240, img_w=320, focal=0.9 * 320, arc_deg=45.0, seed=2
    )
    cfg = dataclasses.replace(small_cfg, filter=GeometricFilterConfig(model="e", max_iterations=128))
    feats = sp.detect_features(images, cfg)
    pl = sp.generate_pairs(5, cfg)
    mi, mv = sp.match_pairs(feats, pl, cfg)
    intr = np.tile(gt["intr"], (5, 1))
    _, mv_e, ok = sp.filter_pairs(feats, pl, mi, mv, cfg, intr=intr)
    assert ok.sum() >= 4, f"adjacent pairs should survive the E filter: {mv_e.sum(1)}"
    # Without intrinsics the model silently degrades to F and still works.
    _, _, ok_f = sp.filter_pairs(feats, pl, mi, mv, cfg, intr=None)
    assert ok_f.sum() >= 4
