"""Additive in-situ profiling: a while_loop that starts trivial and gains
one LM-iteration component at a time (each variant its own jit), at the
500-cam bench shapes.  The minimal loop measures ~0.8 ms/it, so each
variant's delta is that component's true in-loop cost."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from tpusfm.utils import compile_cache
    compile_cache.enable()
    from synth import orbit_scene
    from tpusfm.ba import bundle_adjust as ba
    from tpusfm.ops import obs_table as ot
    from tpusfm.core import lie

    C, P = 500, 50000
    s = orbit_scene(n_cams=C, n_points=P, noise_px=0.5, seed=3, arc_deg=350.0,
                    vis_prob=0.06)
    O = len(s["obs_cam"])
    r = np.random.default_rng(0)
    pose0 = jnp.asarray(np.concatenate([s["aa"], s["t"]], 1), jnp.float32)
    gintr = jnp.asarray(np.tile(s["intr"], (C, 1)), jnp.float32)
    pts0 = jnp.asarray(s["points"], jnp.float32)
    obs_pt = jnp.asarray(s["obs_pt"])
    order, ranks, rank_to_pt, rank_valid = ot.sort_and_rank(
        obs_pt, jnp.ones(O, bool), P)
    obs_cam = jnp.asarray(s["obs_cam"])[order]
    obs_uv = jnp.asarray(s["obs_uv"])[order]
    obs_w = jnp.ones(O, jnp.float32)
    safe = jnp.minimum(rank_to_pt, P - 1)

    ITERS = 16

    def run(level):
        @jax.jit
        def prog(pose, pts):
            def body(c):
                pose, pts, acc, it = c
                if level >= 1:  # camtab + pts_rank prep
                    R = lie.so3_exp(pose[:, :3])
                    Jr = lie.so3_right_jacobian(pose[:, :3])
                    camtab = jnp.concatenate(
                        [pose[:, 3:6], R.reshape(C, 9), Jr.reshape(C, 9)], 1)
                    pts_rank = jnp.where(rank_valid[:, None], pts[safe], 0.0)
                if level >= 2:  # fused linearize kernel
                    camvals, ptvals, wc = ot.linearize_radial3(
                        camtab, gintr, pts_rank, obs_cam, obs_cam, ranks,
                        obs_uv, obs_w, refine=False, refine_mask=(0.0,) * 7,
                        huber_delta=4.0, w_dtype="bf16")
                else:
                    camvals = jnp.zeros((O, 43)) + pose[0, 0] * 0
                    ptvals = jnp.zeros((O, 12))
                    wc = jnp.zeros((O, 18), jnp.bfloat16)
                if level >= 3:  # reductions
                    camred = ot.segsum_table(camvals, obs_cam, C)
                    ptred = ot.segsum_sorted(ptvals, ranks, P)
                    acc = acc + camred[0, 0] + ptred[0, 0]
                else:
                    acc = acc + camvals[0, 0] + ptvals[0, 0] \
                        + wc[0, 0].astype(jnp.float32)
                if level >= 4:  # rank scatter (pt_reduce tail) + gathers
                    red_p = jnp.zeros((P, 12)).at[
                        jnp.where(rank_valid, rank_to_pt, P)].add(
                        jnp.where(rank_valid[:, None], ptred, 0.0),
                        mode="drop")
                    acc = acc + red_p[0, 0]
                if level >= 5:  # schur matvec pair
                    vtab = pose[:, :6]
                    y_r = ot.schur_fwd(wc, obs_cam, ranks, vtab, P)
                    bc = ot.schur_bwd(wc, obs_cam, ranks, y_r, C)
                    acc = acc + bc[0, 0]
                pose = pose + acc * 1e-30
                pts = pts + acc * 1e-30
                return pose, pts, acc, it + 1

            return jax.lax.while_loop(lambda c: c[3] < ITERS, body,
                                      (pose, pts, jnp.float32(0), jnp.int32(0)))

        out = prog(pose0, pts0)
        _ = np.asarray(out[1][:1])
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = prog(pose0, pts0)
            _ = np.asarray(out[1][:1])
            ts.append(time.time() - t0)
        print(f"level {level}: {np.median(ts)/ITERS*1000:7.2f} ms/it",
              flush=True)

    for level in range(6):
        run(level)


if __name__ == "__main__":
    main()
