import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from tpusfm.core import lie

rng = np.random.default_rng(0)


def test_so3_exp_matches_scipy():
    w = rng.normal(size=(64, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_exp_log_roundtrip():
    w = rng.normal(size=(128, 3)).astype(np.float32)
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0, 3.0, size=(128, 1))
    R = lie.so3_exp(jnp.asarray(w))
    w2 = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=2e-4)


def test_so3_log_identity_and_near_pi():
    np.testing.assert_allclose(np.asarray(lie.so3_log(jnp.eye(3))), np.zeros(3), atol=1e-6)
    w = np.array([0.0, 0.0, np.pi - 1e-4], dtype=np.float32)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    w2 = np.asarray(lie.so3_log(jnp.asarray(R)))
    R2 = Rotation.from_rotvec(w2).as_matrix()
    np.testing.assert_allclose(R2, R, atol=1e-3)


def test_rotate_aa_matches_matrix():
    aa = rng.normal(size=(32, 3)).astype(np.float32)
    x = rng.normal(size=(32, 3)).astype(np.float32)
    got = np.asarray(lie.rotate_aa(jnp.asarray(aa), jnp.asarray(x)))
    want = np.einsum("nij,nj->ni", Rotation.from_rotvec(aa).as_matrix(), x)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotate_aa_zero_angle_grad_finite():
    g = jax.grad(lambda a: jnp.sum(lie.rotate_aa(a, jnp.ones(3))))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_inverse_compose():
    w = rng.normal(size=(8, 3)).astype(np.float32)
    t = rng.normal(size=(8, 3)).astype(np.float32)
    R = lie.so3_exp(jnp.asarray(w))
    Ri, ti = lie.se3_inv(R, jnp.asarray(t))
    Rc, tc = lie.se3_compose(R, jnp.asarray(t), Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), np.zeros((8, 3)), atol=1e-5)


def test_camera_center():
    w = rng.normal(size=(3,)).astype(np.float32)
    C = rng.normal(size=(3,)).astype(np.float32)
    R = lie.so3_exp(jnp.asarray(w))
    t = -R @ C  # world->cam translation for center C
    np.testing.assert_allclose(np.asarray(lie.camera_center(R, t)), C, atol=1e-5)
