"""Mesh texturing on the synthetic corner scene with exact GT depths."""

import numpy as np

from tpusfm.dense import meshing, texturing
from tpusfm.utils.synth_render import render_orbit_images


def test_texture_mesh_end_to_end(tmp_path):
    images, gt = render_orbit_images(
        n_views=5, img_h=160, img_w=220, focal=0.8 * 220, arc_deg=60.0, seed=6
    )
    V, H, W = images.shape
    depths = gt["depth"].copy()
    valid = np.isfinite(depths) & (depths < 50)
    depths[~valid] = 0.0
    K = np.array([[gt["intr"][0], 0, W / 2], [0, gt["intr"][1], H / 2], [0, 0, 1]], np.float32)
    rgb = np.repeat((images * 255).astype(np.uint8)[..., None], 3, -1)
    verts, faces, _ = meshing.mesh_from_depths(
        depths, valid, K, gt["R"], gt["t"], cfg=meshing.MeshConfig(grid=48)
    )
    assert len(faces) > 500
    path, ok = texturing.texture_mesh(
        tmp_path, verts, faces, depths, valid, K, gt["R"], gt["t"], rgb,
    )
    assert path.exists()
    assert ok.mean() > 0.5, f"only {ok.mean():.0%} of faces textured"
    obj = path.read_text()
    assert obj.count("\nf ") == len(faces)
    assert (tmp_path / "textured_mesh.png").exists()
    assert "map_Kd textured_mesh.png" in (tmp_path / "textured_mesh.mtl").read_text()
    # Atlas should contain real image content, not just the gray fill.
    from PIL import Image

    atlas = np.asarray(Image.open(tmp_path / "textured_mesh.png"))
    assert atlas.std() > 10
