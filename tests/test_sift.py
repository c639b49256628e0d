import numpy as np
import jax.numpy as jnp
import pytest
from scipy.ndimage import gaussian_filter
from scipy.spatial import cKDTree

from tpusfm.features import sift


def texture(h, w, seed=0):
    """Random multi-scale dot texture with known strong features."""
    r = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for s in (1.5, 3.0, 6.0):
        dots = np.zeros((h, w), np.float32)
        ys, xs = r.integers(0, h, 60), r.integers(0, w, 60)
        dots[ys, xs] = r.choice([-1.0, 1.0], 60)
        img += gaussian_filter(dots, s) * s * s
    img = (img - img.min()) / (img.max() - img.min())
    return img.astype(np.float32)


CFG = sift.SiftConfig(n_octaves=3, max_per_octave=256, max_features=512)


@pytest.fixture(scope="module")
def feats():
    img = texture(160, 200)
    f = sift.detect_and_describe(jnp.asarray(img[None]), CFG)
    return img, f


def test_detection_count_and_fields(feats):
    img, f = feats
    n = int(f.n_valid[0])
    assert n > 50
    kp = np.asarray(f.kp[0])[np.asarray(f.mask[0])]
    h, w = img.shape
    assert np.all(kp[:, 0] >= 0) and np.all(kp[:, 0] <= w)
    assert np.all(kp[:, 1] >= 0) and np.all(kp[:, 1] <= h)
    assert np.all(kp[:, 2] > 0.5)  # sigma
    assert np.all((kp[:, 3] >= 0) & (kp[:, 3] <= 2 * np.pi + 1e-3))


def test_descriptor_range_rootsift(feats):
    _, f = feats
    d = np.asarray(f.desc[0])[np.asarray(f.mask[0])]
    assert d.min() >= 0.0 and d.max() <= 255.0
    # RootSIFT: L2 norm of sqrt(L1-normalized) * 512 ~ 512
    norms = np.linalg.norm(d, axis=1)
    assert np.all(norms > 400) and np.all(norms < 560)


def test_rotation_repeatability_and_matching(feats):
    img, f = feats
    h, w = img.shape
    img_r = np.rot90(img, k=-1).copy()
    fr = sift.detect_and_describe(jnp.asarray(img_r[None]), CFG)
    kp = np.asarray(f.kp[0])[np.asarray(f.mask[0])]
    kpr = np.asarray(fr.kp[0])[np.asarray(fr.mask[0])]
    mapped = np.stack([h - 1 - kp[:, 1], kp[:, 0]], axis=1)  # (x,y) under rot90 cw
    d, _ = cKDTree(kpr[:, :2]).query(mapped, k=1)
    assert (d < 2.0).mean() > 0.7, "keypoint repeatability under 90-deg rotation"

    desc = np.asarray(f.desc[0])[np.asarray(f.mask[0])]
    descr = np.asarray(fr.desc[0])[np.asarray(fr.mask[0])]
    dist = ((desc[:, None] - descr[None]) ** 2).sum(-1)
    nn = dist.argmin(1)
    err = np.linalg.norm(kpr[nn, :2] - mapped, axis=1)
    assert (err < 3.0).mean() > 0.6, "descriptor NN correctness under rotation"


def test_batched_detection(feats):
    imgs = np.stack([texture(96, 128, seed=1), texture(96, 128, seed=2)])
    cfg = sift.SiftConfig(n_octaves=2, max_per_octave=128, max_features=256)
    f = sift.detect_and_describe(jnp.asarray(imgs), cfg)
    assert f.kp.shape[0] == 2
    assert int(f.n_valid[0]) > 10 and int(f.n_valid[1]) > 10


def test_presets():
    n = sift.preset("NORMAL")
    h = sift.preset("HIGH")
    u = sift.preset("ULTRA")
    assert n.peak_thresh == 0.04 and h.peak_thresh == 0.01
    assert u.first_octave == -1
    with pytest.raises(ValueError):
        sift.preset("nope")


def test_uint8_rgb_input():
    img = (texture(96, 128) * 255).astype(np.uint8)
    rgb = np.stack([img] * 3, axis=-1)
    cfg = sift.SiftConfig(n_octaves=2, max_per_octave=128, max_features=256)
    f1 = sift.detect_and_describe(jnp.asarray(rgb[None]), cfg)
    assert int(f1.n_valid[0]) > 10
