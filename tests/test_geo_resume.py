"""GPS geo-registration applied by the staged pipeline + EXISTING_POSES
resume (VERDICT r1 items 7; parity: sparseBuilder.cpp:112-171 getGPS and
:188-193 INITIALIZE_EXISTING_POSES)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from synth import orbit_scene
from tpusfm.pipeline.config import config_from_overrides
from tpusfm.pipeline.staged import StagedPipeline
from tpusfm.sfm import incremental
from tpusfm.utils import geo, metrics
from tpusfm.utils.synth_render import render_orbit_images
from test_incremental import scene_to_feature_tracks


@pytest.fixture(scope="module")
def small_cfg():
    return config_from_overrides(**{
        "sift.n_octaves": 3,
        "sift.max_per_octave": 512,
        "sift.max_features": 768,
        "matching.pair_chunk": 8,
        "filter.max_iterations": 128,
        "feature_batch": 3,
    })


def test_staged_pipeline_applies_gps(tmp_path, small_cfg):
    """views.json GPS fixes land the reconstruction in the ENU metric
    frame: recovered camera centers match the synthetic GPS layout."""
    images, gt = render_orbit_images(
        n_views=6, img_h=240, img_w=320, focal=0.9 * 320, arc_deg=60.0, seed=1
    )
    ws = tmp_path / "ws"
    pipe = StagedPipeline(ws, small_cfg)
    for i, img in enumerate(images):
        Image.fromarray((img * 255).astype(np.uint8)).save(
            pipe.image_dir() / f"v{i:03d}.png")
    pipe.preprocess(focal_prior_px=0.9 * 320)
    # Synthetic GPS: place the true camera centers on an ENU grid around a
    # reference fix (1 deg lat ~ 111 km; scene units ~ meters here).
    views = json.loads((ws / "views.json").read_text())
    ref = (47.0, 8.0, 500.0)
    for i, v in enumerate(views):
        e, n, u = (float(x) for x in gt["centers"][i])
        v["gps"] = [ref[0] + n / 111_194.9,
                    ref[1] + e / (111_194.9 * float(np.cos(np.radians(47.0)))),
                    ref[2] + u]
    (ws / "views.json").write_text(json.dumps(views))

    scene, report = pipe.sparse()
    assert report["geo"] is not None, "geo-registration did not run"
    assert report["geo"]["n_gps"] >= 5
    # Metric frame: camera centers now match the GT ENU layout (relative to
    # view 0's fix) to sub-meter RMS.
    reg = np.asarray(scene.cam_mask)
    assert reg.sum() >= 5
    centers = np.asarray(scene.camera_centers())[reg]
    enu_gt = gt["centers"][reg] - gt["centers"][np.nonzero(reg)[0][0]]
    rms = float(np.sqrt(((centers - centers[0]) - enu_gt) ** 2).mean())
    assert report["geo"]["rms_m"] < 1.0, report["geo"]
    assert rms < 1.0, rms


def test_incremental_existing_poses_resume():
    """Seeding from a prior scene skips the bootstrap and registers only
    the remaining views; the final reconstruction matches a cold run."""
    s = orbit_scene(n_cams=12, n_points=250, noise_px=0.3, seed=5, arc_deg=100.0)
    kp, track_ids = scene_to_feature_tracks(s)
    n_tracks = int(track_ids.max()) + 1
    intr = np.tile(s["intr"], (12, 1))
    cfg = incremental.IncrementalConfig(ransac_iters=256, pnp_iters=128)

    cold = incremental.IncrementalEngine(kp, intr, track_ids, n_tracks, cfg)
    scene_full = cold.run(jax.random.PRNGKey(0))
    assert int(np.asarray(scene_full.cam_mask).sum()) == 12

    # Prior scene: drop the last 4 views (as if a previous run stopped).
    partial_mask = np.asarray(scene_full.cam_mask).copy()
    partial_mask[8:] = False
    partial = scene_full.replace(cam_mask=jnp.asarray(partial_mask))

    warm = incremental.IncrementalEngine(kp, intr, track_ids, n_tracks, cfg)
    seeded = warm.seed_from_scene(partial)
    assert seeded == 8
    scene2 = warm.run(jax.random.PRNGKey(1))
    assert not any("bootstrap" in line for line in warm.log)
    assert any("seeded from existing scene" in line for line in warm.log)
    reg2 = np.asarray(scene2.cam_mask)
    assert reg2.sum() == 12, warm.log
    ate = metrics.ate_rmse(np.asarray(scene2.camera_centers())[reg2],
                           s["centers"][reg2])
    assert ate < 0.02, ate


def test_seed_from_scene_too_few_views():
    s = orbit_scene(n_cams=6, n_points=120, noise_px=0.3, seed=2)
    kp, track_ids = scene_to_feature_tracks(s)
    eng = incremental.IncrementalEngine(
        kp, np.tile(s["intr"], (6, 1)), track_ids, int(track_ids.max()) + 1)
    from tpusfm.sfm.scene import empty_scene

    empty = empty_scene(6, 128, 256)
    assert eng.seed_from_scene(empty) == 0
    assert eng.n_registered == 0
