#!/usr/bin/env python
"""Measure the CPU reference baseline at the MEDIUM rung (BASELINE.md
config 3: 200 views) — round-4 verdict item 6: the CPU baseline had only
ever been measured at the 20-view config, so the medium ATE/fps had no
reference-equivalent comparison.

Matches bench.py's medium scene exactly (240x320, arc 120 deg, seed 2) and
the same contiguous-6 pair policy our pipeline uses there (the reference's
PAIR_CONTIGUOUS mode).  Result is cached into BASELINE_MEASURED.json under
the "medium" key, which bench.py reads.

Runs entirely on host CPU (cv2/numpy) — no TPU needed.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tpusfm.utils.cpu_baseline import run_cpu_baseline
    from tpusfm.utils.synth_render import render_orbit_images
    from tpusfm.utils import metrics

    n_views = 200
    images, gt = render_orbit_images(n_views=n_views, img_h=240, img_w=320,
                                     focal=0.9 * 320, arc_deg=120.0, seed=2)
    t0 = time.time()
    out = run_cpu_baseline(np.asarray(images), gt["intr"], log=log,
                           pair_window=6)
    total = time.time() - t0
    ate = None
    try:
        reg_centers = np.asarray(out["centers"])
        reg = out.get("registered_ids")
        if reg is not None and len(reg_centers) >= 3:
            ate = float(metrics.ate_rmse(reg_centers,
                                         gt["centers"][np.asarray(reg)]))
    except Exception as e:
        log(f"ATE computation failed: {e}")
    d = {
        "config": f"{n_views}x240x320-contig6",
        "fps": round(out["fps"], 4),
        "total_s": round(out["total_s"], 1),
        "times_s": out["times_s"],
        "n_registered": out["n_registered"],
        "ate": None if ate is None or not np.isfinite(ate) else round(ate, 4),
        "pipeline": "cv2.SIFT + BF-ratio(contig-6) + F-RANSAC + PnP + "
                    "numpy Schur-LM BA",
    }
    log(f"medium baseline: {d}")
    cache = Path(__file__).resolve().parent.parent / "BASELINE_MEASURED.json"
    blob = json.loads(cache.read_text()) if cache.exists() else {}
    blob["medium"] = d
    cache.write_text(json.dumps(blob, indent=2))
    print(json.dumps(d))


if __name__ == "__main__":
    main()
