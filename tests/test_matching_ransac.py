import numpy as np
import jax
import jax.numpy as jnp

from tpusfm.core import camera, lie
from tpusfm.matching import match, pairs
from tpusfm.sfm import pnp, ransac

rng = np.random.default_rng(3)


def test_pair_generation():
    p = pairs.exhaustive_pairs(5)
    assert len(p) == 10 and p.dtype == np.int32
    c = pairs.contiguous_pairs(6, window=2)
    assert (c[:, 1] - c[:, 0]).max() == 2 and len(c) == 9
    shards = pairs.shard_pairs(p, 3)
    assert sum(len(s) for s in shards) == 10
    padded, valid = pairs.pad_pairs(p, 8)
    assert len(padded) == 16 and valid.sum() == 10


def test_match_descriptors_exact_and_ratio():
    # 40 distinctive descriptors; B is a permuted copy plus noise.
    da = rng.normal(size=(40, 128)).astype(np.float32) * 50
    perm = rng.permutation(40)
    db = da[perm] + rng.normal(size=(40, 128)).astype(np.float32) * 0.5
    ma = np.ones(40, bool)
    idx, ok = match.match_descriptors(jnp.asarray(da), jnp.asarray(db), jnp.asarray(ma), jnp.asarray(ma))
    got = np.asarray(idx)[np.asarray(ok)]
    want = np.argsort(perm)[np.asarray(ok)]
    np.testing.assert_array_equal(got, want)
    assert np.asarray(ok).mean() > 0.9


def test_match_respects_masks():
    da = rng.normal(size=(16, 128)).astype(np.float32) * 50
    db = np.concatenate([da, da])  # duplicates: ratio test must kill all...
    mb = np.ones(32, bool)
    idx, ok = match.match_descriptors(jnp.asarray(da), jnp.asarray(db), jnp.ones(16, bool), jnp.asarray(mb))
    assert not np.asarray(ok).any(), "duplicate second NN must fail ratio test"
    # ...unless the duplicates are masked out.
    mb2 = np.concatenate([np.ones(16, bool), np.zeros(16, bool)])
    idx, ok = match.match_descriptors(jnp.asarray(da), jnp.asarray(db), jnp.ones(16, bool), jnp.asarray(mb2))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(idx), np.arange(16))


def make_two_view(n=200, outlier_frac=0.3, noise=0.5):
    X = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n, 3)).astype(np.float32)
    intr = np.array([800.0, 800, 320, 240, 0, 0, 0], np.float32)
    R1 = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.02])))
    t1 = np.array([-0.8, 0.1, 0.05], np.float32)
    uv0 = np.asarray(camera.project(jnp.asarray(intr), jnp.eye(3), jnp.zeros(3), jnp.asarray(X)))
    uv1 = np.asarray(camera.project(jnp.asarray(intr), jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(X)))
    uv0 = uv0 + rng.normal(scale=noise, size=uv0.shape).astype(np.float32)
    uv1 = uv1 + rng.normal(scale=noise, size=uv1.shape).astype(np.float32)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    uv1[out_idx] = rng.uniform([0, 0], [640, 480], size=(n_out, 2)).astype(np.float32)
    is_inlier = np.ones(n, bool)
    is_inlier[out_idx] = False
    return dict(X=X, intr=intr, R1=R1, t1=t1, uv0=uv0, uv1=uv1, is_inlier=is_inlier)


def test_ransac_fundamental_rejects_outliers():
    s = make_two_view()
    key = jax.random.PRNGKey(0)
    F, inl, n_inl = ransac.ransac_fundamental(
        key, jnp.asarray(s["uv0"]), jnp.asarray(s["uv1"]), jnp.ones(len(s["uv0"]), bool), n_iters=256
    )
    inl = np.asarray(inl)
    true_in = s["is_inlier"]
    # Recall and precision of inlier classification.
    assert inl[true_in].mean() > 0.95
    # An epipolar constraint is 1-D: random outliers land within the 4 px
    # band around some epipolar line a few % of the time, so rejection is
    # bounded away from 100%.
    assert (~inl)[~true_in].mean() > 0.85


def test_ransac_essential_pose():
    from tpusfm.core import epipolar

    s = make_two_view(outlier_frac=0.3, noise=0.3)
    intr = jnp.asarray(s["intr"])
    x0n = camera.pixel_to_normal(intr, jnp.asarray(s["uv0"]))
    x1n = camera.pixel_to_normal(intr, jnp.asarray(s["uv1"]))
    E, inl, n_inl = ransac.ransac_essential(
        jax.random.PRNGKey(1), x0n, x1n, jnp.ones(len(s["uv0"]), bool),
        n_iters=256, thresh_norm=4.0 / 800.0,
    )
    R, t, n_good, front, X = epipolar.recover_pose(E, x0n, x1n, w=inl.astype(jnp.float32))
    err_R = np.degrees(float(jnp.linalg.norm(lie.so3_log(R @ jnp.asarray(s["R1"]).T))))
    assert err_R < 1.0
    t_dir = np.asarray(t)
    t_true = s["t1"] / np.linalg.norm(s["t1"])
    assert np.linalg.norm(t_dir - t_true) < 0.05


def test_pnp_ransac_registration():
    s = make_two_view(outlier_frac=0.25, noise=0.5)
    intr = jnp.asarray(s["intr"])
    x1n = camera.pixel_to_normal(intr, jnp.asarray(s["uv1"]))
    aa, t, inl, n_inl = pnp.pnp_ransac(
        jax.random.PRNGKey(2), jnp.asarray(s["X"]), x1n, jnp.ones(len(s["X"]), bool),
        n_iters=128,
    )
    R = np.asarray(lie.so3_exp(aa))
    err_R = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R @ s["R1"].T)))))
    err_t = np.linalg.norm(np.asarray(t) - s["t1"])
    assert err_R < 0.5, f"rotation error {err_R} deg"
    assert err_t < 0.05, f"translation error {err_t}"
    assert int(n_inl) > 0.9 * s["is_inlier"].sum()


def test_pnp_dlt_batched():
    s = make_two_view(outlier_frac=0.0, noise=0.0)
    intr = jnp.asarray(s["intr"])
    x1n = np.asarray(camera.pixel_to_normal(intr, jnp.asarray(s["uv1"])))
    Xb = jnp.asarray(np.stack([s["X"][:8], s["X"][8:16]]))
    xb = jnp.asarray(np.stack([x1n[:8], x1n[8:16]]))
    R, t = pnp.pnp_dlt(Xb, xb)
    assert R.shape == (2, 3, 3)
    for i in range(2):
        # f32 eigh on the 12x12 normal matrix bounds accuracy ~1e-3.
        np.testing.assert_allclose(np.asarray(R[i]), s["R1"], atol=8e-3)
        np.testing.assert_allclose(np.asarray(t[i]), s["t1"], atol=8e-3)
