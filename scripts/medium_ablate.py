#!/usr/bin/env python
"""Medium-rung (200-view) ATE ablation — round-4 verdict item 6: is the
8x ATE gap vs the 20-view rung (0.0456 vs 0.0055 in r03) inherent
contiguous-matching drift, or an engine defect?

Arms (all on the same rendered scene as bench medium):
  w6        contiguous window 6 (the bench config)
  w12       contiguous window 12 (doubled overlap -> less drift if the
            error is window-limited)
  w6+polish w6 followed by one full global BA over every observation with
            a larger iteration budget (drift vs local-minimum separation)

Usage: python scripts/medium_ablate.py [cpu]   (chip by default)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

if "cpu" in sys.argv[1:]:
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from tpusfm.utils import compile_cache

    compile_cache.enable()
    from tpusfm.ba import bundle_adjust as ba
    from tpusfm.pipeline.config import config_from_overrides
    from tpusfm.pipeline.sparse import run_sparse
    from tpusfm.utils import metrics
    from tpusfm.utils.synth_render import render_orbit_images

    n_views = 200
    images, gt = render_orbit_images(n_views=n_views, img_h=240, img_w=320,
                                     focal=0.9 * 320, arc_deg=120.0, seed=2)

    def run(window):
        cfg = config_from_overrides(**{
            "sift.n_octaves": 3, "sift.max_per_octave": 512,
            "sift.max_features": 512,
            "matching.pair_mode": "contiguous",
            "matching.contiguous_window": window,
            "matching.pair_chunk": 32, "filter.max_iterations": 128,
            "feature_batch": 10, "engine_type": "incremental"})
        t0 = time.time()
        scene, report = run_sparse(images, gt["intr"], cfg,
                                   key=jax.random.PRNGKey(1))
        dt = time.time() - t0
        reg = np.asarray(scene.cam_mask)
        centers = np.asarray(scene.camera_centers())[reg]
        ate = metrics.ate_rmse(centers, gt["centers"][reg])
        return scene, reg, dt, float(ate), report

    scene6, reg6, dt6, ate6, rep6 = run(6)
    print(f"w6:        ATE {ate6:.4f}  reg {reg6.sum()}/200  {dt6:.1f}s",
          flush=True)

    # Global-BA polish over ALL observations, generous budget.
    bcfg = ba.BAConfig(max_iters=40, cg_iters=60, converge_rtol=1e-7)
    intr, rot, t, pts, info = ba.bundle_adjust(
        scene6.intr, scene6.cam_rot, scene6.cam_t, scene6.cam_mask,
        scene6.points, scene6.point_mask, scene6.obs_cam, scene6.obs_pt,
        scene6.obs_uv, scene6.obs_mask, cfg=bcfg)
    sc = scene6.replace(intr=intr, cam_rot=rot, cam_t=t, points=pts)
    centers = np.asarray(sc.camera_centers())[reg6]
    ate_p = float(metrics.ate_rmse(centers, gt["centers"][reg6]))
    ic, fc = (float(jax.device_get(info["initial_cost"])),
              float(jax.device_get(info["final_cost"])))
    print(f"w6+polish: ATE {ate_p:.4f}  (global BA cost {ic:.1f} -> {fc:.1f},"
          f" {int(jax.device_get(info['iterations']))} it)", flush=True)

    scene12, reg12, dt12, ate12, rep12 = run(12)
    print(f"w12:       ATE {ate12:.4f}  reg {reg12.sum()}/200  {dt12:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
