"""Isolated repro of the round-2 dense TPU worker crash (BENCH_r02 dense=null).

Runs the bench dense config (480x640, 64 planes, view_batch=2, PM 2 iters)
stage by stage so the faulting kernel can be localized.

Usage: python scripts/repro_dense.py [sweep|pm|full] [H W D B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 480
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 640
    D = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    B = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    import jax
    import jax.numpy as jnp
    from tpusfm.utils import compile_cache
    compile_cache.enable()
    from tpusfm.dense import depth as depth_mod
    from tpusfm.dense.patchmatch import PatchMatchConfig
    from tpusfm.parallel import dist_dense

    log(f"devices: {jax.devices()}  mode={mode} H={H} W={W} D={D} B={B}")

    S = 3
    rng = np.random.default_rng(0)
    V = 8
    imgs = rng.random((V, H, W)).astype(np.float32)
    Ks = np.tile(np.array([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1]],
                          np.float32), (V, 1, 1))
    sidx = np.zeros((B, S + 1), np.int32)
    for b in range(B):
        sidx[b, :S] = [(b + 1 + i) % V for i in range(S)]
        sidx[b, S] = b
    R_rel = np.tile(np.eye(3, dtype=np.float32), (B, S, 1, 1))
    # small rotations + baselines
    for b in range(B):
        for s in range(S):
            th = 0.05 * (s + 1)
            R_rel[b, s] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                                    [-np.sin(th), 0, np.cos(th)]], np.float32)
    t_rel = rng.normal(scale=0.2, size=(B, S, 3)).astype(np.float32)
    inv_d = np.tile(np.linspace(0.1, 1.0, D, dtype=np.float32), (B, 1))
    inv_lo = np.full(B, 0.1, np.float32)
    inv_hi = np.full(B, 1.0, np.float32)

    cfg = depth_mod.DenseConfig(n_planes=D, n_sources=S, view_batch=B,
                                pm=PatchMatchConfig(n_iters=2))

    norm = jnp.asarray(imgs)
    Ks_j = jnp.asarray(Ks)

    if mode in ("sweep", "full"):
        for it in range(2):
            t0 = time.time()
            d, c = dist_dense.plane_sweep_all_views(
                norm, Ks_j, jnp.asarray(sidx), jnp.asarray(R_rel),
                jnp.asarray(t_rel), jnp.asarray(inv_d), cfg=cfg)
            d_np = np.asarray(d)
            log(f"sweep[{it}] OK in {time.time()-t0:.1f}s, depth mean {d_np.mean():.3f}")

    if mode in ("pm", "full"):
        if mode == "pm":
            d = jnp.asarray(rng.uniform(1.0, 10.0, size=(B, H, W)).astype(np.float32))
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        for it in range(2):
            t0 = time.time()
            dd, cc = dist_dense.patchmatch_all_views(
                jnp.asarray(imgs), Ks_j, jnp.asarray(sidx), jnp.asarray(R_rel),
                jnp.asarray(t_rel), 1.0 / jnp.maximum(d, 1e-9),
                jnp.asarray(inv_lo), jnp.asarray(inv_hi), keys, cfg.pm)
            dd_np = np.asarray(dd)
            log(f"patchmatch[{it}] OK in {time.time()-t0:.1f}s, depth mean {dd_np.mean():.3f}")

    if mode == "e2e":
        # The bench's dense config on a GT scene (no sparse run needed):
        # project scene points through GT poses to fill the obs table.
        from tpusfm.sfm.scene import Scene
        from tpusfm.utils.synth_render import render_orbit_images
        from tpusfm.core import lie

        nV = 6
        images, gt = render_orbit_images(n_views=nV, img_h=H, img_w=W,
                                         focal=0.9 * W, arc_deg=110.0, seed=0)
        R = gt["R"]
        t = gt["t"]
        aa = np.asarray(jax.vmap(lie.so3_log)(jnp.asarray(R)))
        P = 2000
        pts = rng.uniform(-2.0, 2.0, size=(P, 3)).astype(np.float32)
        ocam, opt, ouv = [], [], []
        for v_ in range(nV):
            Xc = pts @ R[v_].T + t[v_]
            z = Xc[:, 2]
            u = Xc[:, 0] / z * 0.9 * W + W / 2
            vv = Xc[:, 1] / z * 0.9 * W + H / 2
            ok = (z > 0.1) & (u >= 0) & (u < W) & (vv >= 0) & (vv < H)
            idx = np.nonzero(ok)[0]
            ocam.append(np.full(len(idx), v_, np.int32))
            opt.append(idx.astype(np.int32))
            ouv.append(np.stack([u[idx], vv[idx]], 1).astype(np.float32))
        ocam = np.concatenate(ocam)
        opt = np.concatenate(opt)
        ouv = np.concatenate(ouv)
        intr = np.tile(gt["intr"], (nV, 1)).astype(np.float32)
        scene = Scene(
            intr=jnp.asarray(intr), cam_rot=jnp.asarray(aa),
            cam_t=jnp.asarray(t.astype(np.float32)),
            cam_mask=jnp.ones(nV, bool), points=jnp.asarray(pts),
            colors=jnp.zeros((P, 3), jnp.uint8), point_mask=jnp.ones(P, bool),
            obs_cam=jnp.asarray(ocam), obs_pt=jnp.asarray(opt),
            obs_uv=jnp.asarray(ouv), obs_mask=jnp.ones(len(ocam), bool))
        cfg2 = depth_mod.DenseConfig(n_planes=D, n_sources=3, view_batch=2,
                                     pm=PatchMatchConfig(n_iters=2))
        t_start = time.time()

        def prog(stage, frac):
            log(f"  [{time.time()-t_start:7.1f}s] {stage} {frac:.2f}")

        t0 = time.time()
        pts_out, _ = depth_mod.dense_reconstruct(scene, images, None, cfg=cfg2,
                                                 views=list(range(nV)),
                                                 progress=prog)
        log(f"e2e warm (compile): {time.time()-t0:.1f}s, {len(pts_out)} points")
        if len(sys.argv) > 6:  # any extra arg: also measure steady state
            t0 = time.time()
            pts_out, _ = depth_mod.dense_reconstruct(
                scene, images, None, cfg=cfg2, views=list(range(nV)))
            dt = time.time() - t0
            log(f"e2e steady: {dt:.1f}s -> {nV/dt:.3f} views/s, {len(pts_out)} points")

    print("DONE", mode)


if __name__ == "__main__":
    main()
