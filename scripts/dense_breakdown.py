#!/usr/bin/env python
"""Per-component dense-stage timing on the chip + vmap-vs-map gather check.

Hypothesis (round 4): the fast single-row take_along_axis path (1.8 G
gathers/s, scripts/gather_ab3.py) degrades to the slow batched-gather form
(~95 M/s) when the sampler runs under jax.vmap — so the dense pipeline's
view-batched vmap wrappers forfeit the sampling win.

Usage: python scripts/dense_breakdown.py [cpu]
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
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _force(out):
    x = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(x[:1] if getattr(x, "ndim", 0) else x)


def timed(name, fn, *args, reps=1):
    out = fn(*args)
    _ = _force(out)
    t0 = time.time()
    for _i in range(reps):
        out = fn(*args)
        _ = _force(out)
    dt = (time.time() - t0) / reps
    print(f"{name:34s} {dt*1e3:10.1f} ms", flush=True)
    return dt


def main():
    from tpusfm.utils import compile_cache

    compile_cache.enable()

    H, W = 480, 640
    rng = np.random.default_rng(0)

    # --- micro: flat tala under vmap vs lax.map ---
    NS = 2 * 1024 * 1024
    img = jnp.asarray(rng.normal(size=(2, H * W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, H * W - 2, size=(2, NS)).astype(np.int32))

    def sample_one(flat_row, idx_row):
        return jnp.take_along_axis(flat_row[None, :], idx_row[None, :],
                                   axis=1)[0]

    @jax.jit
    def via_vmap(img, idx):
        def it(i, acc):
            o = jax.vmap(sample_one)(img, idx + (acc * 1e-30).astype(jnp.int32))
            return acc + o[0, 0] * 1e-30

        return jax.lax.fori_loop(0, 16, it, jnp.float32(0.0))

    @jax.jit
    def via_map(img, idx):
        def it(i, acc):
            o = jax.lax.map(lambda t: sample_one(t[0], t[1]),
                            (img, idx + (acc * 1e-30).astype(jnp.int32)))
            return acc + o[0, 0] * 1e-30

        return jax.lax.fori_loop(0, 16, it, jnp.float32(0.0))

    n = 2 * NS * 16
    dt = timed("tala vmap(2)", via_vmap, img, idx)
    log(f"  -> {n/dt/1e6:.0f} M/s")
    dt = timed("tala lax.map(2)", via_map, img, idx)
    log(f"  -> {n/dt/1e6:.0f} M/s")

    # --- component timing at the bench dense config ---
    from tpusfm.dense import depth as dense_depth
    from tpusfm.dense.patchmatch import PatchMatchConfig, patchmatch_refine
    from tpusfm.parallel import dist_dense
    from tpusfm.utils.synth_render import render_orbit_images

    images, gt = render_orbit_images(n_views=6, img_h=H, img_w=W,
                                     focal=0.9 * W, arc_deg=80.0, seed=0)
    K = np.array([[gt["intr"][0], 0, gt["intr"][2]],
                  [0, gt["intr"][1], gt["intr"][3]], [0, 0, 1]], np.float32)
    Ks = jnp.asarray(np.tile(K, (6, 1, 1)))
    v, srcs = 2, [1, 3, 0]
    R_rel = np.einsum("sij,kj->sik", gt["R"][srcs], gt["R"][v]).astype(np.float32)
    t_rel = (gt["t"][srcs] - np.einsum("sij,j->si", R_rel, gt["t"][v])).astype(np.float32)
    zgt = gt["depth"][v]
    fin = np.isfinite(zgt)
    lo, hi = np.percentile(zgt[fin], [1, 99])
    lo, hi = 0.8 * lo, 1.2 * hi
    inv_depths = np.linspace(1 / hi, 1 / lo, 64).astype(np.float32)

    cfg = dense_depth.DenseConfig(n_planes=64, n_sources=3)
    norm = np.asarray(jax.jit(jax.vmap(
        lambda im: dense_depth.local_normalize(im, cfg.window)))(jnp.asarray(images)))

    # packed sweep inputs for 2 views (the bench view_batch)
    sidx = jnp.asarray(np.array([[1, 3, 0, 2], [2, 4, 1, 3]], np.int32))
    Rr2 = np.stack([R_rel, R_rel])  # approx fine for timing
    tr2 = np.stack([t_rel, t_rel])
    invd2 = np.stack([inv_depths, inv_depths])

    sweep2 = jax.jit(lambda *a: dist_dense.plane_sweep_all_views(
        *a, cfg=cfg))
    timed("plane_sweep vmap(2) 64pl", sweep2, jnp.asarray(norm), Ks, sidx,
          jnp.asarray(Rr2), jnp.asarray(tr2), jnp.asarray(invd2))

    sweep1 = jax.jit(lambda *a: dense_depth.plane_sweep_depth(
        *a, cfg=cfg))
    timed("plane_sweep single 64pl", sweep1, jnp.asarray(norm[v]),
              jnp.asarray(norm[srcs]), jnp.asarray(K),
              jnp.asarray(np.tile(K, (3, 1, 1))), jnp.asarray(R_rel),
              jnp.asarray(t_rel), jnp.asarray(inv_depths))

    d_sw, _c = sweep1(jnp.asarray(norm[v]), jnp.asarray(norm[srcs]),
                      jnp.asarray(K), jnp.asarray(np.tile(K, (3, 1, 1))),
                      jnp.asarray(R_rel), jnp.asarray(t_rel),
                      jnp.asarray(inv_depths))
    inv_init = 1.0 / jnp.maximum(d_sw, 1e-9)

    pmc = PatchMatchConfig(n_iters=2)
    pm1 = jax.jit(lambda *a: patchmatch_refine(*a, cfg=pmc))
    timed("patchmatch single 2it full", pm1, jnp.asarray(images[v]),
          jnp.asarray(images[srcs]), jnp.asarray(K),
          jnp.asarray(np.tile(K, (3, 1, 1))), jnp.asarray(R_rel),
          jnp.asarray(t_rel), inv_init, jnp.float32(1 / hi),
          jnp.float32(1 / lo), jax.random.PRNGKey(0))

    pmf = PatchMatchConfig(n_iters=1, fine=True)
    pm1f = jax.jit(lambda *a: patchmatch_refine(*a, cfg=pmf))
    timed("patchmatch single 1it fine", pm1f, jnp.asarray(images[v]),
          jnp.asarray(images[srcs]), jnp.asarray(K),
          jnp.asarray(np.tile(K, (3, 1, 1))), jnp.asarray(R_rel),
          jnp.asarray(t_rel), inv_init, jnp.float32(1 / hi),
          jnp.float32(1 / lo), jax.random.PRNGKey(0))

    # half-res coarse, batched 2 (what pm_multiscale runs)
    imgs_half = images[:, : H // 2 * 2, : W // 2 * 2].reshape(
        6, H // 2, 2, W // 2, 2).mean((2, 4)).astype(np.float32)
    Ks_half = np.tile(K, (6, 1, 1)).astype(np.float32)
    Ks_half[:, :2] /= 2
    inv2 = jnp.stack([inv_init[::2, ::2], inv_init[::2, ::2]])
    keys2 = jax.random.split(jax.random.PRNGKey(1), 2)
    pmc2 = jax.jit(lambda *a: dist_dense.patchmatch_all_views(
        *a, pm_cfg=pmc))
    timed("patchmatch vmap(2) 2it half", pmc2, jnp.asarray(imgs_half),
          jnp.asarray(Ks_half), sidx, jnp.asarray(Rr2), jnp.asarray(tr2),
          inv2, jnp.asarray(np.array([1 / hi] * 2, np.float32)),
          jnp.asarray(np.array([1 / lo] * 2, np.float32)), keys2)


if __name__ == "__main__":
    main()
