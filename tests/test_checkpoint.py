import numpy as np

from tpusfm.pipeline import checkpoint
from test_scene_io import make_scene


def test_checkpoint_roundtrip(tmp_path):
    sc = make_scene()
    p = tmp_path / "ckpt"
    checkpoint.save_checkpoint(p, sc, step=7, extra={"lambda": 1e-4})
    sc2, step, extra = checkpoint.load_checkpoint(p)
    assert step == 7
    assert abs(float(extra["lambda"]) - 1e-4) < 1e-12
    for f in sc.__dataclass_fields__:
        np.testing.assert_array_equal(np.asarray(getattr(sc, f)), np.asarray(getattr(sc2, f)))
