import numpy as np
import jax.numpy as jnp

from tpusfm.io import ply
from tpusfm.sfm import scene as scene_mod


def make_scene():
    s = scene_mod.empty_scene(max_cams=4, max_points=16, max_obs=32)
    s = s.replace(
        intr=s.intr.at[:2].set(jnp.asarray([100.0, 100.0, 50.0, 50.0, 0, 0, 0])),
        cam_t=s.cam_t.at[1].set(jnp.asarray([1.0, 0.0, 0.0])),
        cam_mask=s.cam_mask.at[:2].set(True),
        points=s.points.at[:3].set(jnp.asarray([[0.0, 0, 5], [1, 1, 6], [-1, 0.5, 4]])),
        colors=s.colors.at[:3].set(jnp.asarray([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=jnp.uint8)),
        point_mask=s.point_mask.at[:3].set(True),
        obs_cam=s.obs_cam.at[:6].set(jnp.asarray([0, 0, 0, 1, 1, 1], dtype=jnp.int32)),
        obs_pt=s.obs_pt.at[:6].set(jnp.asarray([0, 1, 2, 0, 1, 2], dtype=jnp.int32)),
        obs_mask=s.obs_mask.at[:6].set(True),
    )
    # Set the measurements to the exact projections → zero reprojection error.
    uv = s.project_obs()
    return s.replace(obs_uv=jnp.where(s.obs_mask[:, None], uv, 0.0))


def test_scene_counts_and_reprojection():
    s = make_scene()
    assert int(s.n_cams) == 2 and int(s.n_points) == 3 and int(s.n_obs) == 6
    assert float(jnp.max(s.reprojection_errors())) < 1e-5


def test_scene_npz_roundtrip(tmp_path):
    s = make_scene()
    p = str(tmp_path / "scene.npz")
    scene_mod.save_scene_npz(p, s)
    s2 = scene_mod.load_scene_npz(p)
    for f in s.__dataclass_fields__:
        np.testing.assert_array_equal(np.asarray(getattr(s, f)), np.asarray(getattr(s2, f)))


def test_compact_points_preserves_obs():
    s = make_scene()
    # Invalidate point 1; move point 2's data into a later slot to force motion.
    s = s.replace(point_mask=s.point_mask.at[1].set(False),
                  obs_mask=s.obs_mask & (s.obs_pt != 1))
    before = np.asarray(s.reprojection_errors())[np.asarray(s.obs_mask)]
    c = scene_mod.compact_points(s)
    assert int(c.n_points) == 2
    # valid points occupy the front
    assert bool(np.all(np.asarray(c.point_mask)[:2])) and not np.asarray(c.point_mask)[2:].any()
    after = np.asarray(c.reprojection_errors())[np.asarray(c.obs_mask)]
    np.testing.assert_allclose(after, before, atol=1e-6)


def test_ply_roundtrip_binary(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    cols = np.random.default_rng(1).integers(0, 255, size=(100, 3)).astype(np.uint8)
    path = tmp_path / "cloud.ply"
    n = ply.write_ply_points(path, pts, cols)
    assert n == 100
    xyz, rgb = ply.read_ply_points(path)
    np.testing.assert_allclose(xyz, pts, atol=1e-6)
    np.testing.assert_array_equal(rgb, cols)


def test_ply_ascii_with_cameras_and_nan_guard(tmp_path):
    pts = np.array([[0, 0, 1], [np.nan, 0, 0], [1, 2, 3]], dtype=np.float32)
    cams = np.array([[5, 5, 5]], dtype=np.float32)
    path = tmp_path / "cloud_and_poses.ply"
    n = ply.write_ply_points(path, pts, camera_centers=cams, binary=False)
    assert n == 3  # 2 finite points + 1 camera
    xyz, rgb = ply.read_ply_points(path)
    assert len(xyz) == 3
    np.testing.assert_array_equal(rgb[-1], ply.CAMERA_COLOR)


def test_ply_mesh_writer(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float32)
    f = np.array([[0, 1, 2]], dtype=np.int32)
    path = tmp_path / "mesh.ply"
    ply.write_ply_mesh(path, v, f)
    data = path.read_bytes()
    assert b"element face 1" in data
