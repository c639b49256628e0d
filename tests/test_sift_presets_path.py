"""Preset execution paths: HIGH lowers the peak threshold; ULTRA also
upsamples the input (first_octave=-1) — both must run and yield
monotonically more keypoints (SIFT_describer.hpp:99-117 semantics)."""

import jax.numpy as jnp

from tpusfm.features import sift
from test_sift import texture


def test_preset_paths_monotone_keypoints():
    img = texture(120, 160)
    counts = {}
    for name in ("NORMAL", "HIGH", "ULTRA"):
        cfg = sift.preset(name, n_octaves=3, max_per_octave=256, max_features=512)
        f = sift.detect_and_describe(jnp.asarray(img[None]), cfg)
        counts[name] = int(f.n_valid[0])
        import numpy as np

        kp = np.asarray(f.kp[0])[np.asarray(f.mask[0])]  # valid slots only
        # Coordinates stay in input-image pixels even when ULTRA upsamples.
        assert kp[:, 0].max() <= 160.0 and kp[:, 1].max() <= 120.0
    assert counts["NORMAL"] < counts["HIGH"] <= counts["ULTRA"] * 1.001, counts
