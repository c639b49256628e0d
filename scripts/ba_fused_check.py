#!/usr/bin/env python
"""Chip parity + timing for linearize_reduce_radial3_t (round-4 fused
linearize+reduce kernel) against the separate-kernel path, plus whole-solve
LM-iteration timing at the 500-cam bench shape.

Usage: python scripts/ba_fused_check.py [small] [solveonly]
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


def main():
    small = "small" in sys.argv[1:]
    solveonly = "solveonly" in sys.argv[1:]
    from synth import orbit_scene
    from tpusfm.ba import bundle_adjust as ba
    from tpusfm.core import lie
    from tpusfm.ops import obs_table as ot

    C, P = (100, 8000) if small else (500, 50000)
    s = orbit_scene(n_cams=C, n_points=P, noise_px=0.5, seed=3, arc_deg=350.0,
                    vis_prob=0.12 if small else 0.06)
    O = len(s["obs_cam"])
    log(f"problem: C={C} P={P} O={O}")
    intr = jnp.asarray(np.tile(s["intr"], (C, 1)))
    pose = jnp.asarray(np.concatenate([s["aa"], s["t"]], axis=1), jnp.float32)
    points = jnp.asarray(s["points"], jnp.float32)
    obs_cam0 = jnp.asarray(s["obs_cam"])
    obs_pt0 = jnp.asarray(s["obs_pt"])
    obs_uv0 = jnp.asarray(s["obs_uv"], jnp.float32)

    order, ranks, rank_to_pt, rank_valid = ot.sort_and_rank(
        obs_pt0, jnp.ones(O, bool), P)
    obs_cam = obs_cam0[order]
    obs_uvT = jnp.asarray(obs_uv0[order].T)
    obs_w = jnp.ones(O, jnp.float32)
    obs_grp = obs_cam
    safe_r2p = jnp.minimum(rank_to_pt, P - 1)

    R = lie.so3_exp(pose[:, :3])
    Jr = lie.so3_right_jacobian(pose[:, :3])
    camtab = jnp.concatenate([pose[:, 3:6], R.reshape(C, 9),
                              Jr.reshape(C, 9)], axis=1)
    pts_rank = jnp.where(rank_valid[:, None], points[safe_r2p], 0.0)

    for refine in ([False] if solveonly else [False, True]):
        rm = (1.0,) * 7 if refine else (0.0,) * 7
        if not solveonly:
            fused = ot.linearize_reduce_radial3_t(
                camtab, intr, pts_rank, obs_cam, obs_grp, ranks, obs_uvT,
                obs_w, refine=refine, refine_mask=rm, huber_delta=4.0,
                w_dtype="bf16")
            # Reference: separate kernels (already chip-parity-verified
            # against the sublane path in round 3).
            sep = ot.linearize_radial3_t(
                camtab, intr, pts_rank, obs_cam, obs_grp, ranks, obs_uvT,
                obs_w, refine=refine, refine_mask=rm, huber_delta=4.0,
                w_dtype="bf16")
            camred_f = ot.segsum_table_t(sep[0], obs_cam, C)
            ptred_f = ot.segsum_sorted_t(sep[1], ranks, P)
            pck6 = [i * 6 + j for i in range(6) for j in range(i, 6)]
            pck3 = [i * 3 + j for i in range(3) for j in range(i, 3)]
            ref_cam = np.concatenate(
                [np.asarray(camred_f)[:, pck6],
                 np.asarray(camred_f)[:, 36:42]]
                + ([np.asarray(camred_f)[:, 42:84]] if refine else [])
                + [np.asarray(camred_f)[:, -1:]], axis=1)
            got_cam = np.asarray(fused[0])
            rel = np.abs(got_cam - ref_cam) / (np.abs(ref_cam) + 1e-3)
            print(f"refine={refine} camred rel err max {rel.max():.2e}")
            ref_pt = np.concatenate([np.asarray(ptred_f)[:, pck3],
                                     np.asarray(ptred_f)[:, 9:12]], axis=1)
            got_pt = np.asarray(fused[1])
            relp = np.abs(got_pt - ref_pt) / (np.abs(ref_pt) + 1e-3)
            print(f"refine={refine} ptred  rel err max {relp.max():.2e}")
            relw = np.abs(np.asarray(fused[2], np.float32)
                          - np.asarray(sep[2], np.float32))
            print(f"refine={refine} wcT    abs err max {relw.max():.2e}")
            if refine:
                grp_f = ot.segsum_table_t(sep[3], obs_grp, C)
                pck7 = [i * 7 + j for i in range(7) for j in range(i, 7)]
                ref_g = np.concatenate([np.asarray(grp_f)[:, pck7],
                                        np.asarray(grp_f)[:, 49:56]], axis=1)
                relg = np.abs(np.asarray(fused[3]) - ref_g) / (
                    np.abs(ref_g) + 1e-3)
                print(f"refine={refine} grpred rel err max {relg.max():.2e}")

    # in-situ fused-pass timing (16-iteration loop)
    def lin(x):
        outs = ot.linearize_reduce_radial3_t(
            camtab + x, intr, pts_rank, obs_cam, obs_grp, ranks, obs_uvT,
            obs_w, refine=False, refine_mask=(0.0,) * 7, huber_delta=4.0,
            w_dtype="bf16")
        return outs[0][0, 0]

    def loop(body):
        def run(x):
            def it(i, acc):
                return acc + body(x + acc * 1e-30)
            return jax.lax.fori_loop(0, ITERS, it, jnp.float32(0.0))
        return run

    f = jax.jit(loop(lin))
    out = f(jnp.float32(0.0))
    _ = float(np.asarray(out))
    t0 = time.time()
    _ = float(np.asarray(f(jnp.float32(0.0))))
    print(f"linearize_reduce_t  {(time.time()-t0)/ITERS*1e3:9.2f} ms/pass",
          flush=True)

    # whole-solve at fixed CG budgets
    mask = jnp.ones(C, bool)
    pmask = jnp.ones(P, bool)
    omask = jnp.ones(O, bool)
    for cg in (0, 4, 16):
        cfg = ba.BAConfig(max_iters=8, cg_iters=cg, cg_tol=0.0,
                          converge_rtol=0.0)
        out = ba.bundle_adjust(intr, pose[:, :3], pose[:, 3:6], mask, points,
                               pmask, obs_cam0, obs_pt0, obs_uv0, omask,
                               cfg=cfg)
        _ = np.asarray(out[3][:1])
        t0 = time.time()
        out = ba.bundle_adjust(intr, pose[:, :3], pose[:, 3:6], mask, points,
                               pmask, obs_cam0, obs_pt0, obs_uv0, omask,
                               cfg=cfg)
        _ = np.asarray(out[3][:1])
        dt = time.time() - t0
        n_it = float(jax.device_get(out[4]["iterations"]))
        print(f"solve cg_iters={cg:3d}: {dt/max(n_it,1)*1e3:8.1f} ms/LM-iter"
              f" ({n_it:.0f} its, final cost "
              f"{float(jax.device_get(out[4]['final_cost'])):.4g})",
              flush=True)


if __name__ == "__main__":
    main()
