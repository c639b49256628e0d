"""A/B window patterns for PatchMatch normal/depth accuracy (CPU)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from tpusfm.utils import compile_cache
compile_cache.enable()
from tpusfm.dense import patchmatch as pm
from tpusfm.utils.synth_render import render_orbit_images
from test_patchmatch import _sweep


def main():
    images, gt = render_orbit_images(n_views=5, img_h=144, img_w=192,
                                     focal=0.8 * 192, arc_deg=40.0, seed=4)
    v = 2
    srcs = [1, 3, 0]
    K = np.array([[gt["intr"][0], 0, gt["intr"][2]],
                  [0, gt["intr"][1], gt["intr"][3]], [0, 0, 1]], np.float32)
    R_rel = np.einsum("sij,kj->sik", gt["R"][srcs], gt["R"][v]).astype(np.float32)
    t_rel = (gt["t"][srcs] - np.einsum("sij,j->si", R_rel, gt["t"][v])).astype(np.float32)
    zgt = gt["depth"][v]
    fin = np.isfinite(zgt)
    lo, hi = np.percentile(zgt[fin], [1, 99])
    lo, hi = 0.8 * lo, 1.2 * hi
    st = dict(images=images, gt=gt, v=v, srcs=srcs, K=K, R_rel=R_rel,
              t_rel=t_rel, zgt=zgt, fin=fin, lo=lo, hi=hi)
    d_sweep, _ = _sweep(st)

    dia = [(dy, dx) for dy in range(-4, 5, 2) for dx in range(-4, 5, 2)
           if abs(dy) + abs(dx) <= 4]
    base = [(dy, dx) for dy in range(-6, 7, 3) for dx in range(-6, 7, 3)
            if abs(dy) + abs(dx) <= 6] + [(-6, -6), (-6, 6), (6, -6), (6, 6)]
    variants = {
        "d17+inner4": base + [(-1, 0), (1, 0), (0, -1), (0, 1)],
        "d17+inner4b": base + [(-1, -1), (1, 1), (1, -1), (-1, 1)],
        "dia13_r6d3": [(dy, dx) for dy in range(-6, 7, 3) for dx in range(-6, 7, 3)
                       if abs(dy) + abs(dx) <= 6],
        "dia13_r6d3+c": [(dy, dx) for dy in range(-6, 7, 3) for dx in range(-6, 7, 3)
                         if abs(dy) + abs(dx) <= 6] + [(-6, -6), (-6, 6), (6, -6), (6, 6)],
    }
    orig = pm._window_offsets
    for name, offs in variants.items():
        pm._window_offsets = lambda cfg, _o=offs: list(_o)
        cfg = pm.PatchMatchConfig(n_iters=3, window_pattern="x" + name)
        t0 = time.time()
        d_pm, c_pm, n_pm = jax.device_get(pm.patchmatch_refine(
            jnp.asarray(images[v]), jnp.asarray(images[srcs]), jnp.asarray(K),
            jnp.broadcast_to(jnp.asarray(K), (3, 3, 3)), jnp.asarray(R_rel),
            jnp.asarray(t_rel), 1.0 / jnp.maximum(jnp.asarray(d_sweep), 1e-9),
            jnp.float32(1.0 / hi), jnp.float32(1.0 / lo),
            jax.random.PRNGKey(0), cfg))
        dt = time.time() - t0
        wall = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
        camn = (gt["R"][v] @ wall.T).T
        m = fin.copy()
        m[:12] = m[-12:] = False
        m[:, :12] = m[:, -12:] = False
        m &= np.asarray(c_pm) < 0.3
        n_sel = np.asarray(n_pm)[m]
        cos = np.abs(n_sel @ camn.T)
        ang = np.degrees(np.arccos(np.clip(cos.max(1), -1, 1)))
        rel = np.abs(d_pm - zgt)[m] / zgt[m]
        print(f"{name:14s} n={len(offs):2d} normal_err={np.median(ang):6.2f} "
              f"rel_depth={np.median(rel):.5f} t={dt:.1f}s", flush=True)
    pm._window_offsets = orig


if __name__ == "__main__":
    main()
