import numpy as np
import jax.numpy as jnp

from tpusfm.features import sift
from test_sift import texture


def test_multi_orientation_emits_secondary_peaks():
    img = texture(160, 200)
    f1 = sift.detect_and_describe(
        jnp.asarray(img[None]),
        sift.SiftConfig(n_octaves=3, max_per_octave=256, max_features=512, n_orientations=1),
    )
    f2 = sift.detect_and_describe(
        jnp.asarray(img[None]),
        sift.SiftConfig(n_octaves=3, max_per_octave=256, max_features=512, n_orientations=2),
    )
    n1, n2 = int(f1.n_valid[0]), int(f2.n_valid[0])
    assert n2 > n1, "secondary orientations should add keypoints"
    assert n2 < 2 * n1, "80% rule must reject most secondary peaks"
    # Duplicated slots share position but differ in angle.
    kp2 = np.asarray(f2.kp[0])[np.asarray(f2.mask[0])]
    pos = np.round(kp2[:, :2], 2)
    uniq, counts = np.unique(pos, axis=0, return_counts=True)
    dup = uniq[counts >= 2]
    assert len(dup) > 0
    # Angles at a duplicated position differ by > 30 deg (different peaks).
    sel = np.all(np.isclose(pos, dup[0]), axis=1)
    angs = np.sort(kp2[sel, 3])
    if len(angs) >= 2:
        d = np.diff(angs).min()
        assert d > np.radians(30) or (2 * np.pi - angs[-1] + angs[0]) > np.radians(30)
