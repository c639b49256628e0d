"""Minimal solvers: batched Durand-Kerner roots, P3P (Grunert), 5-point
essential (Stewénius), 7-point fundamental — oracle-backed, plus
RANSAC-level recovery under outlier contamination.

Reference capability being covered: OpenMVG's minimal-solver kernels used
by AC-RANSAC filtering and P3P resection (SURVEY.md §2.2 'OpenMVG
libraries'), cv::solvePnPRansac (src/actuator/SequentialActuator.h:175).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusfm.core.polynomial import poly_roots, real_roots
from tpusfm.core.p3p import p3p_grunert, align_3pts
from tpusfm.core.epipolar import essential_5pt, fundamental_7pt


def _skew(t):
    return np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])


def _rotmat(rng, scale=0.3):
    from scipy.spatial.transform import Rotation

    return Rotation.from_rotvec(rng.normal(size=3) * scale).as_matrix()


class TestPolyRoots:
    def test_quartic_known_roots(self):
        c = np.poly([1.0, 2.0, -3.0, 0.5]).astype(np.float32)
        zr, zi = poly_roots(jnp.asarray(c))
        got = np.sort(np.asarray(zr))
        np.testing.assert_allclose(got, [-3.0, 0.5, 1.0, 2.0], atol=1e-4)
        np.testing.assert_allclose(np.asarray(zi), 0.0, atol=1e-4)

    def test_complex_pair_flagged(self):
        # (z^2 + 1)(z - 2): one real root, one complex pair.
        c = np.array([1.0, -2.0, 1.0, -2.0], np.float32)
        roots, ok = real_roots(jnp.asarray(c))
        roots, ok = np.asarray(roots), np.asarray(ok)
        assert ok.sum() == 1
        np.testing.assert_allclose(roots[ok], [2.0], atol=1e-4)

    def test_batched(self):
        rng = np.random.default_rng(0)
        true = rng.uniform(-2, 2, size=(16, 3))
        coeffs = np.stack([np.poly(r) for r in true]).astype(np.float32)
        zr, zi = map(np.asarray, poly_roots(jnp.asarray(coeffs)))
        for b in range(16):
            np.testing.assert_allclose(np.sort(zr[b]), np.sort(true[b]), atol=1e-3)

    def test_degenerate_no_nan(self):
        c = np.zeros((4, 5), np.float32)  # all-zero polynomials
        zr, zi = map(np.asarray, poly_roots(jnp.asarray(c)))
        assert np.isfinite(zr).all() and np.isfinite(zi).all()


class TestAlign3:
    def test_exact(self):
        rng = np.random.default_rng(1)
        R = _rotmat(rng)
        t = rng.normal(size=3)
        Xw = rng.uniform(-1, 1, size=(3, 3))
        Xc = Xw @ R.T + t
        Rr, tr = map(np.asarray, align_3pts(jnp.asarray(Xw, jnp.float32), jnp.asarray(Xc, jnp.float32)))
        np.testing.assert_allclose(Rr, R, atol=1e-5)
        np.testing.assert_allclose(tr, t, atol=1e-5)


class TestP3P:
    def test_recovers_pose_statistics(self):
        rng = np.random.default_rng(0)
        errs = []
        for _ in range(20):
            R = _rotmat(rng, 0.5)
            t = rng.normal(size=3)
            t[2] = abs(t[2]) + 4
            X = rng.uniform(-1, 1, size=(3, 3))
            Xc = X @ R.T + t
            xn = Xc[:, :2] / Xc[:, 2:3]
            Rs, ts, ok = map(
                np.asarray,
                p3p_grunert(jnp.asarray(X, jnp.float32), jnp.asarray(xn, jnp.float32)),
            )
            errs.append(
                min(np.linalg.norm(Rs[i] - R) + np.linalg.norm(ts[i] - t) for i in range(4))
            )
        errs = np.array(errs)
        assert np.median(errs) < 1e-3
        assert (errs < 1e-2).mean() >= 0.8  # float32 tail on clustered roots

    def test_true_candidate_flagged_ok(self):
        rng = np.random.default_rng(2)
        R = _rotmat(rng)
        t = np.array([0.1, -0.2, 5.0])
        X = rng.uniform(-1, 1, size=(3, 3))
        Xc = X @ R.T + t
        xn = Xc[:, :2] / Xc[:, 2:3]
        Rs, ts, ok = map(
            np.asarray, p3p_grunert(jnp.asarray(X, jnp.float32), jnp.asarray(xn, jnp.float32))
        )
        i = int(np.argmin([np.linalg.norm(Rs[i] - R) for i in range(4)]))
        assert ok[i]

    def test_batched_shape(self):
        rng = np.random.default_rng(3)
        X = jnp.asarray(rng.uniform(-1, 1, size=(7, 3, 3)), jnp.float32)
        xn = jnp.asarray(rng.uniform(-0.3, 0.3, size=(7, 3, 2)), jnp.float32)
        R, t, ok = p3p_grunert(X, xn)
        assert R.shape == (7, 4, 3, 3) and t.shape == (7, 4, 3) and ok.shape == (7, 4)


def _e_err(E, E_true, ok):
    E, ok = np.asarray(E), np.asarray(ok)
    cands = [
        min(np.linalg.norm(E[i] - E_true), np.linalg.norm(E[i] + E_true))
        for i in range(E.shape[0])
        if ok[i]
    ]
    return min(cands) if cands else np.inf


class TestEssential5pt:
    def test_exact_statistics(self):
        rng = np.random.default_rng(1)
        errs = []
        for _ in range(20):
            R = _rotmat(rng)
            t = rng.normal(size=3)
            t /= np.linalg.norm(t)
            E_true = _skew(t) @ R
            E_true /= np.linalg.norm(E_true)
            X = rng.uniform(-1, 1, size=(5, 3))
            X[:, 2] += 4
            x0 = X[:, :2] / X[:, 2:3]
            Xc = X @ R.T + t
            x1 = Xc[:, :2] / Xc[:, 2:3]
            E, ok = essential_5pt(jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32))
            errs.append(_e_err(E, E_true, ok))
        errs = np.array(errs)
        # float32 charpoly roots limit per-sample reliability; RANSAC draws
        # many samples, so the requirement is high typical accuracy.
        assert np.median(errs) < 1e-4
        assert (errs < 1e-2).mean() >= 0.7

    def test_candidates_satisfy_epipolar(self):
        rng = np.random.default_rng(5)
        R = _rotmat(rng)
        t = np.array([1.0, 0.2, -0.1])
        X = rng.uniform(-1, 1, size=(5, 3))
        X[:, 2] += 5
        x0 = X[:, :2] / X[:, 2:3]
        Xc = X @ R.T + t
        x1 = Xc[:, :2] / Xc[:, 2:3]
        E, ok = map(np.asarray, essential_5pt(jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32)))
        p0 = np.concatenate([x0, np.ones((5, 1))], 1)
        p1 = np.concatenate([x1, np.ones((5, 1))], 1)
        for i in range(10):
            if ok[i]:
                resid = np.abs(np.einsum("ni,ij,nj->n", p1, E[i], p0))
                assert resid.max() < 1e-3  # every valid candidate interpolates the 5 points


class TestFundamental7pt:
    def test_exact(self):
        rng = np.random.default_rng(4)
        K = np.array([[800, 0, 320], [0, 800, 240], [0, 0, 1.0]])
        for _ in range(10):
            R = _rotmat(rng)
            t = rng.normal(size=3)
            t /= np.linalg.norm(t)
            F_true = np.linalg.inv(K).T @ (_skew(t) @ R) @ np.linalg.inv(K)
            F_true /= np.linalg.norm(F_true)
            X = rng.uniform(-1, 1, size=(7, 3))
            X[:, 2] += 4
            h0 = np.concatenate([X[:, :2] / X[:, 2:3], np.ones((7, 1))], 1) @ K.T
            Xc = X @ R.T + t
            h1 = np.concatenate([Xc[:, :2] / Xc[:, 2:3], np.ones((7, 1))], 1) @ K.T
            F, ok = fundamental_7pt(
                jnp.asarray(h0[:, :2], jnp.float32), jnp.asarray(h1[:, :2], jnp.float32)
            )
            assert _e_err(F, F_true, ok) < 1e-3


class TestRansacIntegration:
    def test_essential_5pt_ransac_beats_contamination(self):
        from tpusfm.sfm.ransac import ransac_essential_5pt
        from tpusfm.core.epipolar import recover_pose

        rng = np.random.default_rng(3)
        key = jax.random.PRNGKey(0)
        R = _rotmat(rng)
        t = rng.normal(size=3)
        t /= np.linalg.norm(t)
        n = 200
        X = rng.uniform(-2, 2, size=(n, 3))
        X[:, 2] += 6
        x0 = X[:, :2] / X[:, 2:3] + rng.normal(size=(n, 2)) * 1e-3
        Xc = X @ R.T + t
        x1 = Xc[:, :2] / Xc[:, 2:3] + rng.normal(size=(n, 2)) * 1e-3
        x1[:80] = rng.uniform(-0.5, 0.5, size=(80, 2))  # 40% outliers
        E, inl, n_inl = ransac_essential_5pt(
            key, jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32),
            jnp.ones(n, bool), n_iters=128, thresh_norm=0.005,
        )
        Rr, tr, ng, front, Xtri = recover_pose(
            E, jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32),
            inl.astype(jnp.float32),
        )
        Rr = np.asarray(Rr)
        rot_err = np.degrees(np.arccos(np.clip((np.trace(Rr @ R.T) - 1) / 2, -1, 1)))
        assert rot_err < 2.0
        assert int(n_inl) > 90

    def test_pnp_p3p_ransac(self):
        from tpusfm.sfm.pnp import pnp_ransac
        from tpusfm.core import lie

        rng = np.random.default_rng(6)
        key = jax.random.PRNGKey(1)
        R = _rotmat(rng, 0.4)
        t = rng.normal(size=3)
        t[2] = abs(t[2]) + 4
        X = rng.uniform(-2, 2, size=(150, 3))
        Xc = X @ R.T + t
        xn = Xc[:, :2] / Xc[:, 2:3] + rng.normal(size=(150, 2)) * 1e-3
        xn[:60] = rng.uniform(-0.5, 0.5, size=(60, 2))
        aa, tt, inl, n_inl = pnp_ransac(
            key, jnp.asarray(X, jnp.float32), jnp.asarray(xn, jnp.float32),
            jnp.ones(150, bool), n_iters=128, minimal="p3p",
        )
        Rr = np.asarray(lie.so3_exp(aa))
        rot_err = np.degrees(np.arccos(np.clip((np.trace(Rr @ R.T) - 1) / 2, -1, 1)))
        assert rot_err < 1.0
        assert np.linalg.norm(np.asarray(tt) - t) < 0.1
        assert int(n_inl) > 70

    def test_fundamental_7pt_ransac(self):
        from tpusfm.sfm.ransac import ransac_fundamental_7pt

        rng = np.random.default_rng(7)
        key = jax.random.PRNGKey(2)
        K = np.array([[800, 0, 320], [0, 800, 240], [0, 0, 1.0]])
        R = _rotmat(rng)
        t = rng.normal(size=3)
        t /= np.linalg.norm(t)
        F_true = np.linalg.inv(K).T @ (_skew(t) @ R) @ np.linalg.inv(K)
        F_true /= np.linalg.norm(F_true)
        n = 200
        X = rng.uniform(-2, 2, size=(n, 3))
        X[:, 2] += 6
        h0 = np.concatenate([X[:, :2] / X[:, 2:3], np.ones((n, 1))], 1) @ K.T
        Xc = X @ R.T + t
        h1 = np.concatenate([Xc[:, :2] / Xc[:, 2:3], np.ones((n, 1))], 1) @ K.T
        x0 = np.array(h0[:, :2]) + rng.normal(size=(n, 2)) * 0.5
        x1 = np.array(h1[:, :2]) + rng.normal(size=(n, 2)) * 0.5
        x1[:80] = rng.uniform(0, 640, size=(80, 2))
        F, inl, n_inl = ransac_fundamental_7pt(
            key, jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32),
            jnp.ones(n, bool), n_iters=128, thresh_px=2.0,
        )
        F = np.array(F)
        F = F / np.linalg.norm(F)
        assert min(np.linalg.norm(F - F_true), np.linalg.norm(F + F_true)) < 0.1
        assert int(n_inl) > 100  # all ~120 true inliers found
