"""Dense plane-sweep tests against the synthetic renderer's exact
ground-truth depth maps (BASELINE.md config 4, scaled down)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpusfm.core import lie
from tpusfm.dense import depth as dense_depth
from tpusfm.sfm import scene as scene_mod
from tpusfm.utils.synth_render import render_orbit_images


@pytest.fixture(scope="module")
def rendered():
    images, gt = render_orbit_images(
        n_views=6, img_h=180, img_w=240, focal=0.8 * 240, arc_deg=50.0, seed=2
    )
    return images, gt


def gt_scene(gt, n_views, img_shape):
    """Scene object with ground-truth poses and a few sparse points to set
    the depth range."""
    V = n_views
    aa = np.asarray(lie.so3_log(jnp.asarray(gt["R"])))
    # Sparse obs: project a handful of world points near the corner walls.
    rng = np.random.default_rng(0)
    P = 200
    X = rng.uniform([-2.2, -2.2, -2.2], [2.2, 2.2, 2.2], (P, 3)).astype(np.float32)
    obs_cam, obs_pt, obs_uv = [], [], []
    f = gt["intr"][0]
    h, w = img_shape
    for v in range(V):
        Xc = X @ gt["R"][v].T + gt["t"][v]
        z = Xc[:, 2]
        uv = Xc[:, :2] / z[:, None] * f + np.array([w / 2, h / 2])
        vis = (z > 1) & (uv[:, 0] > 0) & (uv[:, 0] < w) & (uv[:, 1] > 0) & (uv[:, 1] < h)
        idx = np.nonzero(vis)[0]
        obs_cam += [v] * len(idx)
        obs_pt += idx.tolist()
        obs_uv += uv[idx].tolist()
    O = len(obs_cam)
    sc = scene_mod.empty_scene(V, P, O)
    return sc.replace(
        intr=jnp.asarray(np.tile(gt["intr"], (V, 1))),
        cam_rot=jnp.asarray(aa, dtype=jnp.float32),
        cam_t=jnp.asarray(gt["t"]),
        cam_mask=jnp.ones(V, bool),
        points=jnp.asarray(X),
        point_mask=jnp.ones(P, bool),
        obs_cam=jnp.asarray(obs_cam, dtype=jnp.int32),
        obs_pt=jnp.asarray(obs_pt, dtype=jnp.int32),
        obs_uv=jnp.asarray(np.asarray(obs_uv, np.float32)),
        obs_mask=jnp.ones(O, bool),
    )


def test_plane_sweep_depth_accuracy(rendered):
    images, gt = rendered
    V, H, W = images.shape
    sc = gt_scene(gt, V, (H, W))
    cfg = dense_depth.DenseConfig(n_planes=48, n_sources=3)
    rgb = np.repeat((images * 255).astype(np.uint8)[..., None], 3, -1)
    pts, cols = dense_depth.dense_reconstruct(sc, images, rgb, cfg, views=[1, 2, 3, 4])
    assert len(pts) > 3000, f"only {len(pts)} fused points"
    # Validate fused points by re-projecting into view 2 and comparing with
    # the renderer's exact depth map.
    v = 2
    Rv = gt["R"][v]
    tv = gt["t"][v]
    Xc = pts @ Rv.T + tv
    z = Xc[:, 2]
    f = gt["intr"][0]
    u = (Xc[:, 0] / z * f + W / 2).round().astype(int)
    w_ = (Xc[:, 1] / z * f + H / 2).round().astype(int)
    inb = (u >= 0) & (u < W) & (w_ >= 0) & (w_ < H) & (z > 0)
    zgt = gt["depth"][v][w_[inb], u[inb]]
    fin = np.isfinite(zgt)  # exclude background (no surface) pixels
    assert fin.mean() > 0.5
    rel = np.abs(z[inb][fin] - zgt[fin]) / zgt[fin]
    assert np.median(rel) < 0.02, f"median relative depth error {np.median(rel):.4f}"
    assert (rel < 0.05).mean() > 0.7


def test_consistency_filter_kills_bad_depth(rendered):
    images, gt = rendered
    V, H, W = images.shape
    sc = gt_scene(gt, V, (H, W))
    K = np.array([[gt["intr"][0], 0, W / 2], [0, gt["intr"][1], H / 2], [0, 0, 1]], np.float32)
    R = gt["R"]
    t = gt["t"]
    # GT depths agree across views -> survive; corrupted map -> killed.
    depths = gt["depth"].copy()
    depths[depths > 50] = 0.0
    costs = np.zeros_like(depths)
    neighbors = np.asarray([[(v + 1) % V, (v - 1) % V, (v + 2) % V] for v in range(V)], np.int32)
    cfg = dense_depth.DenseConfig(min_consistent=2, n_sources=3)
    valid = np.asarray(dense_depth.consistency_filter(
        jnp.asarray(depths), jnp.asarray(costs), jnp.asarray(K),
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(neighbors), cfg,
    ))
    frac_gt = valid[2].mean()
    depths2 = depths.copy()
    depths2[2] *= 1.3  # corrupt view 2's map
    valid2 = np.asarray(dense_depth.consistency_filter(
        jnp.asarray(depths2), jnp.asarray(costs), jnp.asarray(K),
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(neighbors), cfg,
    ))
    assert frac_gt > 0.3  # background/occluded pixels legitimately fail
    assert valid2[2].mean() < 0.05 * frac_gt


def test_mixed_intrinsics_dense(rendered):
    """Per-view K parity (DenseBuilder.h:67-84): views from two cameras
    with DIFFERENT focals reconstruct correct depths — the sweep, the
    consistency filter, and fusion must all use each view's own K."""
    fA, fB = 0.8 * 240, 0.6 * 240
    imgsA, gtA = render_orbit_images(
        n_views=6, img_h=180, img_w=240, focal=fA, arc_deg=50.0, seed=2)
    imgsB, gtB = render_orbit_images(
        n_views=6, img_h=180, img_w=240, focal=fB, arc_deg=50.0, seed=2)
    # Interleave: even views from camera A, odd from camera B — same world
    # scene (same seed), different intrinsics per view.
    images = np.where(np.arange(6)[:, None, None] % 2 == 0, imgsA, imgsB)
    sc = gt_scene(gtA, 6, (180, 240))
    intr = np.asarray(sc.intr).copy()
    intr[1::2, 0] = intr[1::2, 1] = fB
    # Rebuild the sparse obs for the B views at their focal (depth range).
    sc = sc.replace(intr=jnp.asarray(intr))
    cfg = dense_depth.DenseConfig(n_planes=32, n_sources=3, patchmatch=False)
    pts, _c, maps = dense_depth.dense_reconstruct(
        sc, images, None, cfg=cfg, return_maps=True)
    assert maps["K"].shape == (6, 3, 3)
    assert maps["K"][0, 0, 0] == pytest.approx(fA)
    assert maps["K"][1, 0, 0] == pytest.approx(fB)
    # Depth accuracy per group vs each camera's own ground truth.
    for v in (0, 1, 2, 3):
        gt_d = (gtA if v % 2 == 0 else gtB)["depth"][v]
        d = maps["depths"][v]
        ok = maps["valid"][v] & (gt_d > 0) & np.isfinite(gt_d)
        if ok.sum() < 500:
            continue
        rel = np.abs(d[ok] - gt_d[ok]) / gt_d[ok]
        assert np.median(rel) < 0.05, (v, float(np.median(rel)))
    # Both groups contributed points.
    assert (maps["depths"][0] > 0).any() and (maps["depths"][1] > 0).any()
