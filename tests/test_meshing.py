"""TSDF + marching tetrahedra tests on exact ground-truth depth maps."""

import numpy as np

from tpusfm.dense import meshing
from tpusfm.utils.synth_render import render_orbit_images


def test_mesh_from_gt_depths():
    images, gt = render_orbit_images(
        n_views=6, img_h=160, img_w=220, focal=0.8 * 220, arc_deg=70.0, seed=4
    )
    V, H, W = images.shape
    depths = gt["depth"].copy()
    valid = np.isfinite(depths) & (depths < 50)
    depths[~valid] = 0.0
    K = np.array([[gt["intr"][0], 0, W / 2], [0, gt["intr"][1], H / 2], [0, 0, 1]], np.float32)
    rgb = np.repeat((images * 255).astype(np.uint8)[..., None], 3, -1)
    cfg = meshing.MeshConfig(grid=64)
    verts, faces, colors = meshing.mesh_from_depths(
        depths, valid, K, gt["R"], gt["t"], rgb_images=rgb, cfg=cfg
    )
    assert len(verts) > 1000 and len(faces) > 1000
    assert colors is not None and len(colors) == len(verts)
    # Faces index valid vertices.
    assert faces.max() < len(verts) and faces.min() >= 0
    # Surface should hug the corner walls: vertices lie within the room bounds.
    assert np.all(verts.min(0) > -4.0) and np.all(verts.max(0) < 4.0)
    # Geometric sanity: most vertices near one of the three planes
    # (x=-2.2, z=2.2(back-right wall at z=+e? walls: x=-e plane, z=+e? see
    # renderer: planes at x=-e (U along z), z=+e... actually O=(-e,-e,-e)
    # U=(0,0,2e) -> wall x=-e; O=(-e,-e,e) U=(2e,0,0) -> wall z=+e; floor
    # y=-e).  Distance to nearest of the three planes should be small.
    e = 2.2
    d = np.minimum.reduce([
        np.abs(verts[:, 0] + e), np.abs(verts[:, 2] - e), np.abs(verts[:, 1] + e)
    ])
    assert np.median(d) < 0.15, f"median plane distance {np.median(d):.3f}"


def test_mesh_from_point_cloud_fallback():
    rng = np.random.default_rng(0)
    # Points sampled on a sphere of radius 1.
    p = rng.normal(size=(20000, 3))
    p = p / np.linalg.norm(p, axis=1, keepdims=True)
    rgb = np.full((len(p), 3), 128, np.uint8)
    verts, faces, colors = meshing.reconstruct_mesh(p, rgb, meshing.MeshConfig(grid=48))
    assert len(verts) > 500 and len(faces) > 500
    r = np.linalg.norm(verts, axis=1)
    assert abs(np.median(r) - 1.0) < 0.15


def test_refine_mesh_reduces_error():
    images, gt = render_orbit_images(
        n_views=6, img_h=160, img_w=220, focal=0.8 * 220, arc_deg=70.0, seed=4
    )
    V, H, W = images.shape
    depths = gt["depth"].copy()
    valid = np.isfinite(depths) & (depths < 50)
    depths[~valid] = 0.0
    K = np.array([[gt["intr"][0], 0, W / 2], [0, gt["intr"][1], H / 2], [0, 0, 1]], np.float32)
    tsdf_v, mask_v, origin, voxel = _tsdf(depths, K, gt)
    verts, faces = meshing.marching_tetrahedra(tsdf_v, mask_v, origin, voxel)
    rng = np.random.default_rng(0)
    noisy = verts + rng.normal(scale=0.05, size=verts.shape).astype(np.float32)

    def plane_err(v):
        e = 2.2
        return np.median(np.minimum.reduce([
            np.abs(v[:, 0] + e), np.abs(v[:, 2] - e), np.abs(v[:, 1] + e)
        ]))

    refined = meshing.refine_mesh(noisy, faces, depths, valid, K, gt["R"], gt["t"], iters=8)
    assert plane_err(refined) < 0.6 * plane_err(noisy), (
        f"refinement should reduce plane error: {plane_err(noisy):.4f} -> {plane_err(refined):.4f}"
    )


def _tsdf(depths, K, gt):
    import jax.numpy as jnp

    V, H, W = depths.shape
    # small fused grid around the corner
    origin = np.array([-3.0, -3.0, -3.0], np.float32)
    voxel = 6.0 / 63
    tsdf, w = meshing.tsdf_fuse(
        jnp.asarray(depths), jnp.asarray(K), jnp.asarray(gt["R"]), jnp.asarray(gt["t"]),
        jnp.asarray(origin), np.float32(voxel), np.float32(3 * voxel), 64,
    )
    return np.asarray(tsdf), np.asarray(w) >= 1.0, origin, voxel


def test_photometric_refine_beats_depth_only():
    """Photometric RefineMesh parity (round-2 verdict 8; OpenMVS RefineMesh,
    src/main.cpp:184-185): starting from a mesh built on NOISY depth maps,
    the image-consistency refinement must reduce both the photoconsistency
    cost and the geometry error vs ground truth BEYOND what the depth-only
    refiner can do (the depth-only refiner can only reproduce the noisy
    depths; the images carry the clean signal)."""
    import jax.numpy as jnp
    from tpusfm.dense import meshing
    from tpusfm.utils.synth_render import render_orbit_images

    images, gt = render_orbit_images(
        n_views=5, img_h=144, img_w=192, focal=0.8 * 192, arc_deg=40.0, seed=4)
    V = len(images)
    f = float(gt["intr"][0])
    K = np.array([[f, 0, gt["intr"][2]], [0, f, gt["intr"][3]], [0, 0, 1]],
                 np.float32)
    R, t = gt["R"].astype(np.float32), gt["t"].astype(np.float32)
    rng = np.random.default_rng(0)
    depth_gt = gt["depth"].copy()
    valid = np.isfinite(depth_gt) & (depth_gt < 50)
    depth_gt[~valid] = 0.0
    # 6% depth noise: poor depth maps but informative images — the regime
    # where photoconsistency carries extra signal.  (At ~1.5% noise the
    # depth-refined mesh already sits at the stereo sub-pixel limit of the
    # same images, and the photometric term cannot beat it — measured.)
    depths = depth_gt * (1.0 + rng.normal(scale=0.06, size=depth_gt.shape))
    depths = (depths * valid).astype(np.float32)

    verts, faces, _ = meshing.mesh_from_depths(
        depths, valid, K, R, t, cfg=meshing.MeshConfig(grid=72))
    assert len(verts) > 500

    def surf_err(v_arr):
        """Median |z - z_gt| / z_gt of vertices projected into each view."""
        errs = []
        for vi in range(V):
            Xc = v_arr @ R[vi].T + t[vi]
            z = Xc[:, 2]
            u = np.round(Xc[:, 0] / np.maximum(z, 1e-9) * f + K[0, 2]).astype(int)
            w_ = np.round(Xc[:, 1] / np.maximum(z, 1e-9) * f + K[1, 2]).astype(int)
            inb = (z > 0.1) & (u >= 0) & (u < 192) & (w_ >= 0) & (w_ < 144)
            zg = depth_gt[vi][w_[inb], u[inb]]
            fin = zg > 0
            errs.append(np.abs(z[inb][fin] - zg[fin]) / zg[fin])
        return float(np.median(np.concatenate(errs)))

    def photo_cost(v_arr):
        """Mean photoconsistency at the current vertices (s = 0 sweep)."""
        s0, c0, m0 = meshing._photo_sweep(
            jnp.asarray(v_arr, jnp.float32),
            jnp.asarray(np.tile([0, 0, 1.0], (len(v_arr), 1)), jnp.float32),
            jnp.asarray(np.tile([1.0, 0, 0], (len(v_arr), 1)), jnp.float32),
            jnp.asarray(np.tile([0, 1.0, 0], (len(v_arr), 1)), jnp.float32),
            jnp.asarray(np.tile(np.arange(4), (len(v_arr), 1)).astype(np.int32)),
            jnp.ones((len(v_arr), 4), jnp.float32),
            jnp.asarray(images), jnp.asarray(np.tile(K, (V, 1, 1))),
            jnp.asarray(R), jnp.asarray(t), jnp.float32(0.0),
            jnp.float32(0.05), 1)
        c = np.asarray(c0)
        return float(np.mean(c[c < 2.0]))

    v_depth = meshing.refine_mesh(verts, faces, depths, valid, K, R, t)
    v_photo = meshing.refine_mesh_photometric(
        v_depth, faces, images, K, R, t, depths, valid, iters=6,
        step_frac=1.0)

    e_init, e_depth, e_photo = surf_err(verts), surf_err(v_depth), surf_err(v_photo)
    p_depth, p_photo = photo_cost(v_depth), photo_cost(v_photo)
    # Geometry error drops vs the depth-only refiner...
    assert e_photo < 0.85 * e_depth, (e_init, e_depth, e_photo)
    # ...and reprojection photoconsistency improves.
    assert p_photo < p_depth, (p_depth, p_photo)
