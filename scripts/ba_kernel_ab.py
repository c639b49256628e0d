#!/usr/bin/env python
"""In-situ per-kernel cost breakdown of the BA solver at the bench shape
(500 cams / 50k points / ~1.48M obs) — round 4, verdict item 2.

Round 3 left the solver at 57 ms/LM-iter (~5% of its 2.7 ms HBM roofline)
with the residue attributed to "per-grid-step overhead and narrow window
scatter matmuls" but no per-kernel numbers.  This measures each pallas
kernel (and the XLA glue between them) in a 16-iteration jitted loop.

Usage: python scripts/ba_kernel_ab.py [small]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax
import jax.numpy as jnp

ITERS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(np.asarray(out))
    t0 = time.time()
    out = f(*args)
    _ = float(np.asarray(out))
    dt = time.time() - t0
    print(f"{name:28s} {dt/ITERS*1e3:9.2f} ms/pass", flush=True)
    return dt / ITERS


def main():
    small = "small" in sys.argv[1:]
    from synth import orbit_scene
    from tpusfm.ba import bundle_adjust as ba
    from tpusfm.ops import obs_table as ot

    C, P = (100, 8000) if small else (500, 50000)
    s = orbit_scene(n_cams=C, n_points=P, noise_px=0.5, seed=3, arc_deg=350.0,
                    vis_prob=0.12 if small else 0.06)
    O = len(s["obs_cam"])
    log(f"problem: C={C} P={P} O={O}")
    r = np.random.default_rng(0)
    intr = jnp.asarray(np.tile(s["intr"], (C, 1)))
    pose = jnp.asarray(
        np.concatenate([s["aa"], s["t"]], axis=1), jnp.float32)
    points = jnp.asarray(s["points"], jnp.float32)
    obs_cam = jnp.asarray(s["obs_cam"])
    obs_pt = jnp.asarray(s["obs_pt"])
    obs_uv = jnp.asarray(s["obs_uv"], jnp.float32)
    obs_w = jnp.ones(O, jnp.float32)

    order, ranks, rank_to_pt, rank_valid = ot.sort_and_rank(
        obs_pt, obs_w > 0, P)
    obs_cam = obs_cam[order]
    obs_pt = obs_pt[order]
    obs_uv = obs_uv[order]
    obs_uvT = jnp.asarray(obs_uv.T)
    obs_grp = obs_cam  # one group per camera
    safe_r2p = jnp.minimum(rank_to_pt, P - 1)

    from tpusfm.core import lie

    R = lie.so3_exp(pose[:, :3])
    Jr = lie.so3_right_jacobian(pose[:, :3])
    camtab = jnp.concatenate([pose[:, 3:6], R.reshape(C, 9),
                              Jr.reshape(C, 9)], axis=1)
    pts_rank = jnp.where(rank_valid[:, None], points[safe_r2p], 0.0)

    def loop(body):
        def run(x):
            def it(i, acc):
                return acc + body(x + acc * 1e-30)

            return jax.lax.fori_loop(0, ITERS, it, jnp.float32(0.0))

        return run

    # 1. fused linearization (writes 43+12+18 rows x O)
    def lin(x):
        outs = ot.linearize_radial3_t(
            camtab + x, intr, pts_rank, obs_cam, obs_grp, ranks, obs_uvT,
            obs_w, refine=False, refine_mask=(0.0,) * 7, huber_delta=4.0,
            w_dtype="bf16")
        return outs[0][0, 0]

    bench("linearize_radial3_t", loop(lin), jnp.float32(0.0))

    # fixed inputs for the reduction kernels
    outs = ot.linearize_radial3_t(
        camtab, intr, pts_rank, obs_cam, obs_grp, ranks, obs_uvT, obs_w,
        refine=False, refine_mask=(0.0,) * 7, huber_delta=4.0, w_dtype="bf16")
    camvalsT, ptvalsT, wT = outs
    camvalsT = jax.device_get(camvalsT) is None and camvalsT or camvalsT

    def camred(x):
        return ot.segsum_table_t(camvalsT + x, obs_cam, C)[0, 0]

    bench("segsum_table_t (43,O)->C", loop(camred), jnp.float32(0.0))

    def ptred(x):
        return ot.segsum_sorted_t(ptvalsT + x, ranks, P)[0, 0]

    bench("segsum_sorted_t (12,O)->P", loop(ptred), jnp.float32(0.0))

    vtab = jnp.asarray(r.normal(size=(C, 6)), jnp.float32)
    ztab = jnp.asarray(r.normal(size=(P, 3)), jnp.float32)

    def sfwd(x):
        return ot.schur_fwd_t(wT, obs_cam, ranks, vtab + x, P)[0, 0]

    bench("schur_fwd_t", loop(sfwd), jnp.float32(0.0))

    def sbwd(x):
        return ot.schur_bwd_t(wT, obs_cam, ranks, ztab + x, C)[0, 0]

    bench("schur_bwd_t", loop(sbwd), jnp.float32(0.0))

    # CG-iteration XLA glue: Hpp^-1 apply + small einsums + vdots
    Hinv_rank = jnp.asarray(r.normal(size=(P, 3, 3)) * 0.01, jnp.float32)
    Hcc_d = jnp.asarray(r.normal(size=(C, 6, 6)), jnp.float32)

    def glue(x):
        y_r = jnp.einsum("pij,pj->pi", Hinv_rank, ztab + x)
        Hv = jnp.einsum("cij,cj->ci", Hcc_d, vtab)
        return jnp.vdot(Hv, Hv) * 1e-30 + y_r[0, 0] * 1e-30

    bench("cg glue (einsum+vdot)", loop(glue), jnp.float32(0.0))

    # 2. whole-solve timings at fixed CG budgets (converge_rtol=0 so every
    # LM iteration runs): the slope gives ms/CG-iter, intercept the fixed.
    mask = jnp.ones(C, bool)
    pmask = jnp.ones(P, bool)
    omask = jnp.ones(O, bool)
    for cg in (0, 4, 16, 30):
        cfg = ba.BAConfig(max_iters=8, cg_iters=cg, cg_tol=0.0,
                          converge_rtol=0.0)
        out = ba.bundle_adjust(intr, pose[:, :3], pose[:, 3:6], mask, points,
                               pmask, obs_cam, obs_pt, obs_uv, omask, cfg=cfg)
        _ = np.asarray(out[3][:1])
        t0 = time.time()
        out = ba.bundle_adjust(intr, pose[:, :3], pose[:, 3:6], mask, points,
                               pmask, obs_cam, obs_pt, obs_uv, omask, cfg=cfg)
        _ = np.asarray(out[3][:1])
        dt = time.time() - t0
        n_it = float(jax.device_get(out[4]["iterations"]))
        print(f"solve cg_iters={cg:3d}: {dt/max(n_it,1)*1e3:8.1f} ms/LM-iter"
              f" ({n_it:.0f} its)", flush=True)


if __name__ == "__main__" and "prep" not in sys.argv[1:]:
    main()


def prep_bench():
    """Per-solve preprocessing cost: sort_and_rank + obs-table reorders."""
    import sys, time
    from pathlib import Path

    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from synth import orbit_scene
    from tpusfm.ops import obs_table as ot

    C, P = 500, 50000
    s = orbit_scene(n_cams=C, n_points=P, noise_px=0.5, seed=3,
                    arc_deg=350.0, vis_prob=0.06)
    obs_cam = jnp.asarray(s["obs_cam"])
    obs_pt = jnp.asarray(s["obs_pt"])
    obs_uv = jnp.asarray(s["obs_uv"], jnp.float32)
    O = obs_cam.shape[0]
    obs_w = jnp.ones(O, jnp.float32)

    @jax.jit
    def prep(obs_cam, obs_pt, obs_uv, obs_w):
        order, ranks, r2p, rv = ot.sort_and_rank(obs_pt, obs_w > 0, P)
        return (obs_cam[order], obs_pt[order], obs_uv[order], obs_w[order],
                ranks, r2p, rv)

    @jax.jit
    def sort_only(obs_pt, obs_w):
        return ot.sort_and_rank(obs_pt, obs_w > 0, P)

    for name, f, args in (("prep full", prep, (obs_cam, obs_pt, obs_uv, obs_w)),
                          ("sort_and_rank only", sort_only, (obs_pt, obs_w))):
        out = f(*args)
        _ = np.asarray(out[0][:1])
        t0 = time.time()
        for _i in range(4):
            out = f(*args)
            _ = np.asarray(out[0][:1])
        print(f"{name:22s} {(time.time()-t0)/4*1e3:8.1f} ms", flush=True)


if __name__ == "__main__" and "prep" in sys.argv[1:]:
    prep_bench()


if __name__ == "__main__" and "prep2" in sys.argv[1:]:
    # payload-sort variant timing
    import numpy as np
    import jax
    import jax.numpy as jnp

    from synth import orbit_scene
    from tpusfm.ops import obs_table as ot

    C, P = 500, 50000
    s = orbit_scene(n_cams=C, n_points=P, noise_px=0.5, seed=3,
                    arc_deg=350.0, vis_prob=0.06)
    obs_cam = jnp.asarray(s["obs_cam"])
    obs_pt = jnp.asarray(s["obs_pt"])
    obs_uv = jnp.asarray(s["obs_uv"], jnp.float32)
    O = obs_cam.shape[0]
    obs_w = jnp.ones(O, jnp.float32)

    @jax.jit
    def prep2(obs_cam, obs_pt, obs_uv, obs_w):
        return ot.sort_and_rank_payload(
            obs_pt, obs_w > 0, P,
            (obs_cam.astype(jnp.int32), obs_cam.astype(jnp.int32),
             obs_uv[:, 0], obs_uv[:, 1], obs_w))

    out = prep2(obs_cam, obs_pt, obs_uv, obs_w)
    _ = np.asarray(out[0][0][:1])
    t0 = time.time()
    for _i in range(4):
        out = prep2(obs_cam, obs_pt, obs_uv, obs_w)
        _ = np.asarray(out[0][0][:1])
    print(f"prep payload-sort      {(time.time()-t0)/4*1e3:8.1f} ms",
          flush=True)
