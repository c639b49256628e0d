"""Per-stage breakdown of mesh-mode (devices=8) vs single-device run_sparse
on the virtual CPU mesh — the bench's mesh_8dev section, instrumented."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import dataclasses
import json

from tpusfm.utils import compile_cache
compile_cache.enable()
from tpusfm.pipeline.config import config_from_overrides
from tpusfm.pipeline.sparse import run_sparse
from tpusfm.utils.synth_render import render_orbit_images

cfg = config_from_overrides(**{
    "sift.n_octaves": 3, "sift.max_per_octave": 512, "sift.max_features": 768,
    "matching.pair_chunk": 4, "filter.max_iterations": 128, "feature_batch": 3})
images, gt = render_orbit_images(n_views=6, img_h=240, img_w=320,
                                 focal=0.9 * 320, arc_deg=60.0, seed=1)
out = {}
for ndev in (1, 8):
    c = dataclasses.replace(cfg, devices=ndev)
    run_sparse(images, gt["intr"], c)  # warm
    best = None
    for _ in range(2):
        t0 = time.time()
        _, rep = run_sparse(images, gt["intr"], c)
        dt = time.time() - t0
        if best is None or dt < best[0]:
            best = (dt, rep)
    dt, rep = best
    out[str(ndev)] = {"seconds": round(dt, 2),
                      "registered": rep["n_registered"],
                      "times_s": rep["times_s"]}
    print(ndev, "->", round(dt, 2), "s", rep["times_s"], flush=True)
print(json.dumps(out))
