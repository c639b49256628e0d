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
