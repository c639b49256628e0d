import numpy as np
import jax.numpy as jnp
import pytest

from tpusfm.core import lie
from tpusfm.sfm import scene as scene_mod
from tpusfm.utils import geo


def test_lla_to_enu_local_axes():
    ref = (37.0, -122.0, 10.0)
    # ~1e-5 deg latitude ~ 1.11 m north.
    enu = geo.lla_to_enu([37.00001], [-122.0], [10.0], ref)
    assert abs(enu[0, 1] - 1.11) < 0.02 and abs(enu[0, 0]) < 0.01
    enu2 = geo.lla_to_enu([37.0], [-122.0], [25.0], ref)
    assert abs(enu2[0, 2] - 15.0) < 0.01


def test_georegister_scene_recovers_metric_frame():
    rng = np.random.default_rng(0)
    V, P = 6, 50
    # Ground-truth metric camera centers in a local frame.
    centers_m = rng.uniform(-20, 20, (V, 3))
    centers_m[:, 2] = rng.uniform(0, 5, V)
    aa = rng.normal(scale=0.2, size=(V, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(aa)))
    pts_m = rng.uniform(-30, 30, (P, 3)).astype(np.float32)
    # Reconstruction lives in an arbitrary similarity frame.
    s_true, R_g = 0.05, np.asarray(lie.so3_exp(jnp.asarray([0.1, -0.3, 0.8])))
    t_g = np.array([3.0, -1.0, 2.0])
    centers_rec = (centers_m - t_g) @ R_g * (1 / s_true)  # inverse similarity
    pts_rec = (pts_m - t_g) @ R_g * (1 / s_true)
    t_rec = -np.einsum("vij,vj->vi", R, centers_rec)  # t = -R C
    sc = scene_mod.empty_scene(V, P, 1)
    sc = sc.replace(
        cam_rot=jnp.asarray(aa),
        cam_t=jnp.asarray(t_rec.astype(np.float32)),
        cam_mask=jnp.ones(V, bool),
        points=jnp.asarray(pts_rec.astype(np.float32)),
        point_mask=jnp.ones(P, bool),
    )
    # GPS fixes = metric centers converted to lat/lon around a reference.
    ref = (37.0, -122.0, 0.0)
    lat = 37.0 + centers_m[:, 1] / 111_111.0
    lon = -122.0 + centers_m[:, 0] / (111_111.0 * np.cos(np.radians(37.0)))
    alt = centers_m[:, 2]
    gps = [(lat[i], lon[i], alt[i]) for i in range(V)]

    out, info = geo.georegister_scene(sc, gps)
    assert info["rms_m"] < 0.5, info
    assert abs(info["scale"] - s_true) < 0.01 * s_true + 1e-4
    # Points land near their metric positions in the ENU frame, whose origin
    # is the first GPS fix (camera 0's position).
    enu_pts = np.asarray(out.points)
    expected = pts_m - centers_m[0]
    assert np.median(np.linalg.norm(enu_pts - expected, axis=1)) < 1.0


def test_georegister_needs_three_fixes():
    sc = scene_mod.empty_scene(4, 4, 1).replace(cam_mask=jnp.ones(4, bool))
    with pytest.raises(ValueError):
        geo.georegister_scene(sc, [None, (37.0, -122.0, 0.0), None, None])
