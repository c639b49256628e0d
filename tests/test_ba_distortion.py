"""Self-calibrating BA with radial distortion + shared intrinsic groups.

Parity target: the reference's production engine runs PINHOLE_CAMERA_RADIAL3
(src/sparseBuilder/sparseBuilder.cpp:480-502) with GroupSharedIntrinsics
(sparseBuilder.cpp:554-556) and BA refine ADJUST_ALL (focal + pp + k1/k2/k3,
sparseBuilder.cpp:1292-1293).  Acceptance (VERDICT r1 item 2): a synthetic
scene rendered with k1=-0.2 recovers k to <5% and the pose quality matches
the distortion-free case."""

import numpy as np
import jax.numpy as jnp

from synth import orbit_scene
from tpusfm.ba import bundle_adjust as ba

K1_TRUE = -0.2


def _problem(k1=0.0, n_cams=16, n_points=400, seed=4, noise_px=0.3,
             perturb=0.01):
    s = orbit_scene(n_cams=n_cams, n_points=n_points, noise_px=noise_px,
                    seed=seed, k1=k1, arc_deg=200.0)
    r = np.random.default_rng(seed + 1)
    C = n_cams
    # Initial intrinsics: correct focal/pp, ZERO distortion (what the
    # pipeline knows before self-calibration).
    intr0 = np.tile(s["intr"], (C, 1)).astype(np.float32)
    intr0[:, 4:] = 0.0
    O = len(s["obs_cam"])
    args = dict(
        intr=jnp.asarray(intr0),
        cam_rot=jnp.asarray(s["aa"] + r.normal(scale=perturb, size=(C, 3)),
                            jnp.float32),
        cam_t=jnp.asarray(s["t"] + r.normal(scale=perturb, size=(C, 3)),
                          jnp.float32),
        cam_mask=jnp.ones(C, bool),
        points=jnp.asarray(
            s["points"] + r.normal(scale=2 * perturb, size=(n_points, 3)),
            jnp.float32),
        point_mask=jnp.asarray(s["point_valid"]),
        obs_cam=jnp.asarray(s["obs_cam"]),
        obs_pt=jnp.asarray(s["obs_pt"]),
        obs_uv=jnp.asarray(s["obs_uv"]),
        obs_mask=jnp.ones(O, bool),
    )
    return s, args


def test_shared_group_recovers_k1():
    """One shared intrinsic block across all views recovers k1=-0.2 to <5%."""
    s, args = _problem(k1=K1_TRUE)
    C = args["intr"].shape[0]
    cfg = ba.BAConfig(max_iters=40, refine_intrinsics=True, refine_params="all")
    intr, rot, t, pts, info = ba.bundle_adjust(
        cfg=cfg, cam_group=jnp.zeros(C, jnp.int32), n_groups=1, **args)
    # Noise floor: 0.3 px on ~4.8k observations is ~0.7% of the initial cost.
    assert float(info["final_cost"]) < float(info["initial_cost"]) * 0.01
    k1 = np.asarray(intr)[:, 4]
    # Shared group: every view carries the identical refined block.
    assert np.ptp(k1) == 0.0
    rel = abs(k1[0] - K1_TRUE) / abs(K1_TRUE)
    assert rel < 0.05, f"k1 recovered {k1[0]:.4f} vs {K1_TRUE} (rel {rel:.3f})"
    # Focal stays put (self-calibration must not trade k against f).
    f_rel = np.abs(np.asarray(intr)[:, 0] - s["intr"][0]) / s["intr"][0]
    assert f_rel.max() < 0.02


def test_distorted_matches_distortion_free_quality():
    """Self-calibrated solve on distorted data reaches the same residual
    quality as a plain solve on undistorted data (ATE analog)."""
    _, args_d = _problem(k1=K1_TRUE, seed=9)
    _, args_f = _problem(k1=0.0, seed=9)
    C = args_d["intr"].shape[0]
    grp = jnp.zeros(C, jnp.int32)

    cfg_d = ba.BAConfig(max_iters=40, refine_intrinsics=True)
    cfg_f = ba.BAConfig(max_iters=40)
    *_, info_d = ba.bundle_adjust(cfg=cfg_d, cam_group=grp, n_groups=1, **args_d)
    *_, info_f = ba.bundle_adjust(cfg=cfg_f, **args_f)
    # Per-obs RMS cost within 20% of the distortion-free solve.
    rms_d = float(info_d["final_cost"]) / float(info_d["n_obs"])
    rms_f = float(info_f["final_cost"]) / float(info_f["n_obs"])
    assert rms_d < rms_f * 1.2, (rms_d, rms_f)


def test_two_intrinsic_groups_recover_separately():
    """Views from two physical cameras (different k1) refine two separate
    shared blocks — the GroupSharedIntrinsics contract."""
    # Render two half-orbits with different distortion, then interleave.
    sA, argsA = _problem(k1=-0.15, n_cams=8, seed=12)
    sB, argsB = _problem(k1=0.1, n_cams=8, seed=12)
    C = 16
    intr = jnp.concatenate([argsA["intr"], argsB["intr"]])
    rot = jnp.concatenate([argsA["cam_rot"], argsB["cam_rot"]])
    t = jnp.concatenate([argsA["cam_t"], argsB["cam_t"]])
    pts = argsA["points"]  # same seed -> same cloud/perturbation
    # Offset camera ids of the B half.
    obs_cam = jnp.concatenate([argsA["obs_cam"], argsB["obs_cam"] + 8])
    obs_pt = jnp.concatenate([argsA["obs_pt"], argsB["obs_pt"]])
    obs_uv = jnp.concatenate([argsA["obs_uv"], argsB["obs_uv"]])
    obs_mask = jnp.concatenate([argsA["obs_mask"], argsB["obs_mask"]])
    grp = jnp.asarray([0] * 8 + [1] * 8, jnp.int32)

    cfg = ba.BAConfig(max_iters=40, refine_intrinsics=True)
    intr_out, *_, info = ba.bundle_adjust(
        intr=intr, cam_rot=rot, cam_t=t, cam_mask=jnp.ones(C, bool),
        points=pts, point_mask=argsA["point_mask"],
        obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=obs_uv, obs_mask=obs_mask,
        cfg=cfg, cam_group=grp, n_groups=2)
    k1 = np.asarray(intr_out)[:, 4]
    assert np.ptp(k1[:8]) == 0.0 and np.ptp(k1[8:]) == 0.0
    assert abs(k1[0] - (-0.15)) < 0.05 * 0.15 + 0.01
    assert abs(k1[8] - 0.1) < 0.05 * 0.1 + 0.01


def test_refine_params_subsets():
    """refine_params='focal' leaves pp and distortion untouched."""
    _, args = _problem(k1=0.0, n_cams=8, n_points=200, seed=3)
    intr0 = np.asarray(args["intr"]).copy()
    intr0[:, 0] *= 1.02
    intr0[:, 1] *= 1.02
    args["intr"] = jnp.asarray(intr0)
    C = 8
    cfg = ba.BAConfig(max_iters=30, refine_intrinsics=True,
                      refine_params="focal")
    intr, *_ = ba.bundle_adjust(cfg=cfg, cam_group=jnp.zeros(C, jnp.int32),
                                n_groups=1, **args)
    out = np.asarray(intr)
    # pp and k frozen at their initial values.
    np.testing.assert_array_equal(out[:, 2:], intr0[:, 2:])
    # focal pulled back toward truth.
    f_err = abs(out[0, 0] / (intr0[0, 0] / 1.02) - 1.0)
    assert f_err < 0.01, f_err


def test_sharded_shared_intrinsics_matches_single():
    """Distortion-refining shared-group BA under shard_map matches the
    single-device solve (the dense coupling tables are psum'd pre-
    contraction)."""
    import jax
    from tpusfm.parallel import dist_ba, mesh as mesh_mod

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")
    s, args = _problem(k1=K1_TRUE, n_cams=8, n_points=200, seed=6)
    C = 8
    grp = jnp.zeros(C, jnp.int32)
    cfg = ba.BAConfig(max_iters=10, refine_intrinsics=True)
    i1, r1, t1, p1, info1 = ba.bundle_adjust(
        cfg=cfg, cam_group=grp, n_groups=1, **args)

    m = mesh_mod.make_mesh(8)
    O = args["obs_cam"].shape[0]
    ocam, opt, ouv, omask = dist_ba.shard_obs_table(
        np.asarray(args["obs_cam"]), np.asarray(args["obs_pt"]),
        np.asarray(args["obs_uv"]), np.ones(O, bool), 8)
    rest = {k: v for k, v in args.items()
            if k not in ("obs_cam", "obs_pt", "obs_uv", "obs_mask")}
    i2, r2, t2, p2, info2 = dist_ba.bundle_adjust_sharded(
        m, obs_cam=ocam, obs_pt=opt, obs_uv=ouv, obs_mask=omask,
        cfg=cfg, cam_group=grp, n_groups=1, **rest)
    np.testing.assert_allclose(np.asarray(i2)[:, 4], np.asarray(i1)[:, 4],
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=5e-3)


def test_incremental_engine_self_calibrates():
    """End-to-end engine run on distorted observations: with a shared
    intrinsic group and refine_intrinsics, the incremental engine registers
    the sequence AND recovers k1 (the staged pipeline's RADIAL3 path)."""
    import jax
    from tpusfm.sfm import incremental
    from tpusfm.utils import metrics
    from test_incremental import scene_to_feature_tracks

    s = orbit_scene(n_cams=12, n_points=250, noise_px=0.3, seed=5,
                    arc_deg=100.0, k1=K1_TRUE)
    kp, track_ids = scene_to_feature_tracks(s)
    n_tracks = int(track_ids.max()) + 1
    V = len(s["R"])
    # The engine starts from zero distortion (what EXIF gives it).
    intr0 = np.tile(s["intr"], (V, 1)).astype(np.float32)
    intr0[:, 4:] = 0.0
    import dataclasses

    cfg = incremental.IncrementalConfig(
        ransac_iters=256, pnp_iters=128, ba_every=4,
        ba=dataclasses.replace(incremental.IncrementalConfig().ba,
                               refine_intrinsics=True))
    eng = incremental.IncrementalEngine(kp, intr0, track_ids, n_tracks, cfg,
                                        cam_group=np.zeros(V, np.int32))
    scene = eng.run(jax.random.PRNGKey(0))

    reg = np.asarray(scene.cam_mask)
    assert reg.sum() >= 11, f"only {reg.sum()} views registered; log: {eng.log}"
    k = np.asarray(scene.intr)[reg][:, 4:7]
    assert np.ptp(k, axis=0).max() == 0.0  # one shared block
    # With k1..k3 all free on a 100-degree arc the individual coefficients
    # trade against each other (classic radial-polynomial collinearity), so
    # judge what the camera model actually does: the recovered distortion
    # CURVE must match the true k1-only curve over the observed radius
    # range to sub-percent.
    r2 = np.linspace(0.0, 0.12, 32)  # observed xn radius^2 range (640x480, f=800)
    scale_rec = 1 + r2 * (k[0, 0] + r2 * (k[0, 1] + r2 * k[0, 2]))
    scale_true = 1 + r2 * K1_TRUE
    assert np.abs(scale_rec - scale_true).max() < 0.005, (k[0], scale_rec - scale_true)
    centers = np.asarray(scene.camera_centers())[reg]
    ate = metrics.ate_rmse(centers, s["centers"][reg])
    assert ate < 0.02, f"ATE {ate:.4f}"
