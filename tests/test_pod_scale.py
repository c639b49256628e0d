"""Pod-scale ladder test (BASELINE.md config 5, scaled to the CI mesh):
1000-camera distributed bundle adjustment with the observation table
sharded across 8 (virtual) devices.

Gated behind TPUSFM_SLOW=1; validates that the distributed Schur solver
converges at 1000+ cameras and stays numerically consistent when sharded
— the real multi-host run only swaps the mesh."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from tpusfm.ba import bundle_adjust as ba
from tpusfm.core import lie
from tpusfm.parallel import dist_ba, mesh as mesh_mod
from tpusfm.utils import metrics
from synth import orbit_scene

pytestmark = pytest.mark.skipif(
    os.environ.get("TPUSFM_SLOW") != "1", reason="set TPUSFM_SLOW=1 for pod-scale tests"
)


def test_1000_camera_distributed_ba():
    C, P = 1000, 40000
    s = orbit_scene(n_cams=C, n_points=P, noise_px=0.5, seed=4, arc_deg=355.0,
                    vis_prob=0.04)
    O = len(s["obs_cam"])
    assert O > 200_000
    r = np.random.default_rng(1)
    args = dict(
        intr=jnp.asarray(np.tile(s["intr"], (C, 1))),
        cam_rot=jnp.asarray(s["aa"] + r.normal(scale=0.008, size=(C, 3)), dtype=jnp.float32),
        cam_t=jnp.asarray(s["t"] + r.normal(scale=0.008, size=(C, 3)), dtype=jnp.float32),
        cam_mask=jnp.ones(C, bool),
        points=jnp.asarray(s["points"] + r.normal(scale=0.02, size=(P, 3)), dtype=jnp.float32),
        point_mask=jnp.asarray(s["point_valid"]),
    )
    m = mesh_mod.make_mesh(8)
    ocam, opt, ouv, omask = dist_ba.shard_obs_table(
        s["obs_cam"], s["obs_pt"], s["obs_uv"], np.ones(O, bool), 8
    )
    cfg = ba.BAConfig(max_iters=8, cg_iters=25, obs_chunk=32768)
    intr, rot, t, pts, info = dist_ba.bundle_adjust_sharded(
        m, obs_cam=ocam, obs_pt=opt, obs_uv=ouv, obs_mask=omask, cfg=cfg, **args
    )
    rmse = float(np.sqrt(2 * float(info["final_cost"]) / O))
    assert rmse < 0.8, f"rmse {rmse}px at the 0.5px noise floor"
    centers = np.asarray(lie.camera_center(lie.so3_exp(rot), t))
    ate = metrics.ate_rmse(centers, s["centers"])
    assert ate < 0.01, f"ATE {ate}"
