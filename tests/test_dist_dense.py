"""View-cluster sharded dense depth vs the single-device path."""

import numpy as np
import jax.numpy as jnp
from functools import partial

from tpusfm.dense import depth as depth_mod
from tpusfm.parallel import dist_dense, mesh as mesh_mod
from tpusfm.utils.synth_render import render_orbit_images
from test_dense import gt_scene

import jax


def test_sharded_sweep_matches_local():
    images, gt = render_orbit_images(
        n_views=8, img_h=120, img_w=160, focal=0.8 * 160, arc_deg=70.0, seed=3
    )
    V, H, W = images.shape
    sc = gt_scene(gt, V, (H, W))
    cfg = depth_mod.DenseConfig(n_planes=24, n_sources=3)
    norm = jnp.asarray(np.asarray(
        jax.jit(jax.vmap(partial(depth_mod.local_normalize, w=cfg.window)))(jnp.asarray(images))
    ))
    K = jnp.asarray(np.array(
        [[gt["intr"][0], 0, W / 2], [0, gt["intr"][1], H / 2], [0, 0, 1]], np.float32))
    sidx, Rr, tr, invd, _lo, _hi = dist_dense.pack_sweep_inputs(sc, list(range(V)), cfg, 24)
    Ks = jnp.broadcast_to(K, (V, 3, 3))

    d_local, c_local = dist_dense.plane_sweep_all_views(
        norm, Ks, jnp.asarray(sidx), jnp.asarray(Rr), jnp.asarray(tr), jnp.asarray(invd), cfg
    )
    m = mesh_mod.make_mesh(8)
    d_shard, c_shard = dist_dense.plane_sweep_sharded(
        m, norm, Ks, jnp.asarray(sidx), jnp.asarray(Rr), jnp.asarray(tr), jnp.asarray(invd), cfg
    )
    # Reduction-order float noise shifts the parabolic sub-plane refinement
    # slightly; agreement to ~0.1% of depth is exact for practical purposes.
    d_s = np.asarray(d_shard)
    d_l = np.asarray(d_local)
    assert (np.abs(d_s - d_l) / np.maximum(d_l, 1e-6) < 2e-3).mean() > 0.995
    np.testing.assert_allclose(np.asarray(c_shard), np.asarray(c_local), atol=1e-4)
    # And the depths are actually meaningful vs ground truth.
    zgt = gt["depth"][3]
    good = np.isfinite(zgt) & (np.asarray(c_local[3]) < 0.5)
    rel = np.abs(np.asarray(d_local[3])[good] - zgt[good]) / zgt[good]
    assert np.median(rel) < 0.03
