import numpy as np
import jax.numpy as jnp

from tpusfm.core import camera, epipolar, homography, lie, triangulate

rng = np.random.default_rng(1)


def make_two_view(n=100, noise=0.0, k_radial=False):
    """Synthetic two-view scene with known ground truth."""
    X = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n, 3)).astype(np.float32)
    intr = np.array([800.0, 800.0, 320.0, 240.0, 0, 0, 0], dtype=np.float32)
    if k_radial:
        intr[4:7] = [-0.1, 0.02, 0.0]
    w = np.array([0.05, -0.1, 0.02], dtype=np.float32)
    R1 = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t1 = np.array([-0.8, 0.1, 0.05], dtype=np.float32)
    R0 = np.eye(3, dtype=np.float32)
    t0 = np.zeros(3, dtype=np.float32)
    uv0 = np.asarray(camera.project(jnp.asarray(intr), jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X)))
    uv1 = np.asarray(camera.project(jnp.asarray(intr), jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(X)))
    if noise:
        uv0 = uv0 + rng.normal(scale=noise, size=uv0.shape).astype(np.float32)
        uv1 = uv1 + rng.normal(scale=noise, size=uv1.shape).astype(np.float32)
    return dict(X=X, intr=intr, R1=R1, t1=t1, uv0=uv0, uv1=uv1)


def test_project_unproject_roundtrip_radial():
    s = make_two_view(k_radial=True)
    intr = jnp.asarray(s["intr"])
    xn = camera.pixel_to_normal(intr, jnp.asarray(s["uv0"]))
    # reproject normalized coords at depth of the true point
    X = s["X"]
    np.testing.assert_allclose(np.asarray(xn), X[:, :2] / X[:, 2:3], atol=1e-4)


def test_fundamental_8pt_epipolar_constraint():
    s = make_two_view()
    F = epipolar.fundamental_8pt(jnp.asarray(s["uv0"]), jnp.asarray(s["uv1"]))
    err = np.asarray(epipolar.sampson_error(F, jnp.asarray(s["uv0"]), jnp.asarray(s["uv1"])))
    assert np.sqrt(err.mean()) < 1e-2  # pixels


def test_fundamental_matches_truth():
    s = make_two_view()
    K = np.asarray(camera.k_matrix(jnp.asarray(s["intr"])))
    E_true = np.asarray(lie.hat(jnp.asarray(s["t1"]))) @ s["R1"]
    F_true = np.linalg.inv(K).T @ E_true @ np.linalg.inv(K)
    F_true /= np.linalg.norm(F_true)
    F = np.asarray(epipolar.fundamental_8pt(jnp.asarray(s["uv0"]), jnp.asarray(s["uv1"])))
    if np.sign(F[2, 2]) != np.sign(F_true[2, 2]):
        F = -F
    np.testing.assert_allclose(F, F_true, atol=1e-4)


def test_essential_and_recover_pose():
    s = make_two_view()
    intr = jnp.asarray(s["intr"])
    x0n = camera.pixel_to_normal(intr, jnp.asarray(s["uv0"]))
    x1n = camera.pixel_to_normal(intr, jnp.asarray(s["uv1"]))
    E = epipolar.essential_8pt(x0n, x1n)
    R, t, n_good, front, X = epipolar.recover_pose(E, x0n, x1n)
    assert int(n_good) >= 99
    np.testing.assert_allclose(np.asarray(R), s["R1"], atol=1e-3)
    t_true = s["t1"] / np.linalg.norm(s["t1"])
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)
    # Triangulated structure matches ground truth up to scale.
    scale = np.linalg.norm(s["t1"])
    np.testing.assert_allclose(np.asarray(X) * scale, s["X"], atol=5e-2)


def test_triangulate_two_view_pixels():
    s = make_two_view(noise=0.3)
    K = np.asarray(camera.k_matrix(jnp.asarray(s["intr"])))
    P0 = K @ np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
    P1 = K @ np.hstack([s["R1"], s["t1"][:, None]]).astype(np.float32)
    X = triangulate.triangulate_two_view(jnp.asarray(P0), jnp.asarray(P1), jnp.asarray(s["uv0"]), jnp.asarray(s["uv1"]))
    assert np.median(np.linalg.norm(np.asarray(X) - s["X"], axis=-1)) < 2e-2


def test_triangulate_n_view_masked():
    s = make_two_view()
    K = np.asarray(camera.k_matrix(jnp.asarray(s["intr"])))
    P0 = K @ np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
    P1 = K @ np.hstack([s["R1"], s["t1"][:, None]]).astype(np.float32)
    # 4 slots: views 0, 1 valid; 2 junk slots masked out.
    P = jnp.stack([jnp.asarray(P0), jnp.asarray(P1), jnp.zeros((3, 4)), jnp.ones((3, 4))])
    i = 7
    x = jnp.stack([jnp.asarray(s["uv0"][i]), jnp.asarray(s["uv1"][i]), jnp.zeros(2), jnp.full((2,), 1e3)])
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    X = triangulate.triangulate_n_view(P, x, mask)
    np.testing.assert_allclose(np.asarray(X), s["X"][i], atol=1e-2)


def test_homography_planar_scene():
    # Points on a plane z = 5.
    n = 50
    X = rng.uniform([-2, -2, 5], [2, 2, 5.0000001], size=(n, 3)).astype(np.float32)
    intr = jnp.asarray([500.0, 500.0, 320.0, 240.0, 0, 0, 0], dtype=jnp.float32)
    w = np.array([0.1, 0.05, -0.03], dtype=np.float32)
    R1 = lie.so3_exp(jnp.asarray(w))
    t1 = jnp.asarray([0.4, -0.2, 0.1])
    uv0 = camera.project(intr, jnp.eye(3), jnp.zeros(3), jnp.asarray(X))
    uv1 = camera.project(intr, R1, t1, jnp.asarray(X))
    H = homography.homography_dlt(uv0, uv1)
    err = np.asarray(homography.homography_transfer_error(H, uv0, uv1))
    assert np.sqrt(err.max()) < 1e-2


def test_batched_solvers():
    """Leading batch dim gives one model per row — the RANSAC unit of work."""
    s = make_two_view(n=8)
    uv0 = jnp.broadcast_to(jnp.asarray(s["uv0"]), (16, 8, 2))
    uv1 = jnp.broadcast_to(jnp.asarray(s["uv1"]), (16, 8, 2))
    F = epipolar.fundamental_8pt(uv0, uv1)
    assert F.shape == (16, 3, 3)
    err = epipolar.sampson_error(F, uv0, uv1)
    assert err.shape == (16, 8)
    assert float(jnp.max(err)) < 1e-2
