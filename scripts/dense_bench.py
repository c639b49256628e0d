#!/usr/bin/env python
"""On-chip dense-stage benchmark at the BENCH config (480x640, 6 views,
plane sweep 64 + PatchMatch 2 iters, 3 sources) — measures views/s for the
round-4 sampling redesign (flat take_along_axis).  r03 recorded 0.067
views/s at this exact config.

Usage: python scripts/dense_bench.py [small] [cpu]
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
    small = "small" in sys.argv[1:]
    from tpusfm.dense import depth as dense_depth
    from tpusfm.dense.patchmatch import PatchMatchConfig
    from tpusfm.pipeline.config import config_from_overrides
    from tpusfm.pipeline.sparse import run_sparse
    from tpusfm.utils.synth_render import render_orbit_images

    h, w = (240, 320) if small else (480, 640)
    images, gt = render_orbit_images(n_views=8, img_h=h, img_w=w,
                                     focal=0.9 * w, arc_deg=110.0, seed=0)
    cfg = config_from_overrides(**{
        "sift.n_octaves": 3, "sift.max_per_octave": 768,
        "sift.max_features": 768, "matching.pair_chunk": 16,
        "filter.max_iterations": 128, "feature_batch": 8})
    scene, _ = run_sparse(images, gt["intr"], cfg, key=jax.random.PRNGKey(0))
    reg_views = [int(v) for v in np.nonzero(np.asarray(scene.cam_mask))[0]]
    views = reg_views[:6]
    dcfg = dense_depth.DenseConfig(n_planes=32 if small else 64,
                                   n_sources=3, view_batch=2,
                                   pm=PatchMatchConfig(n_iters=2))
    t0 = time.time()
    pts, _ = dense_depth.dense_reconstruct(scene, images, None, cfg=dcfg,
                                           views=views)
    log(f"warm (compile): {time.time()-t0:.1f}s")
    t0 = time.time()
    pts, _ = dense_depth.dense_reconstruct(scene, images, None, cfg=dcfg,
                                           views=views)
    dt = time.time() - t0
    print(f"dense: {len(views)} views in {dt:.2f}s = "
          f"{len(views)/dt:.3f} views/s, {len(pts)} points "
          f"(r03 baseline: 0.067 views/s)")


if __name__ == "__main__":
    main()
