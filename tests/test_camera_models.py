"""Brown-T2 / fisheye / spherical camera models (intrinsic factory parity,
src/sparseBuilder/sparseBuilder.cpp:484-497): projection round-trips, BA
self-calibration of the tangential terms, and an end-to-end incremental
reconstruction of a Brown-distorted synthetic scene (round-2 verdict 9).

Width dispatch: 7-lane intrinsics = RADIAL3 (reference default), 9-lane =
Brown [fx,fy,cx,cy,k1,k2,k3,t1,t2]; fisheye ([.. k1..k4, 0]) and spherical
are named explicitly."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusfm.ba import bundle_adjust as ba
from tpusfm.core import camera as cam
from tpusfm.core import lie
from tpusfm.sfm import incremental
from tpusfm.utils import metrics
from synth import orbit_scene
from test_incremental import scene_to_feature_tracks


def test_brown_projection_roundtrip():
    intr = jnp.asarray([500.0, 510, 320, 240, -0.15, 0.03, 0.001, 0.012, -0.007])
    rng = np.random.default_rng(0)
    Xc = rng.uniform([-2, -2, 2], [2, 2, 8], size=(500, 3)).astype(np.float32)
    uv = cam.camera_to_pixel(jnp.broadcast_to(intr, (500, 9)), jnp.asarray(Xc))
    xn = cam.pixel_to_normal(jnp.broadcast_to(intr, (500, 9)), uv)
    xn_gt = Xc[:, :2] / Xc[:, 2:3]
    np.testing.assert_allclose(np.asarray(xn), xn_gt, atol=1e-4)


def test_brown_t0_matches_radial3():
    """The 9-vector with t1 = t2 = 0 reproduces the RADIAL3 7-vector."""
    intr7 = jnp.asarray([500.0, 500, 320, 240, -0.1, 0.02, 0.003])
    intr9 = jnp.concatenate([intr7, jnp.zeros(2)])
    rng = np.random.default_rng(1)
    Xc = jnp.asarray(rng.uniform([-1, -1, 2], [1, 1, 6], size=(200, 3)).astype(np.float32))
    uv7 = cam.camera_to_pixel(jnp.broadcast_to(intr7, (200, 7)), Xc)
    uv9 = cam.camera_to_pixel(jnp.broadcast_to(intr9, (200, 9)), Xc)
    np.testing.assert_allclose(np.asarray(uv7), np.asarray(uv9), atol=1e-4)


def test_fisheye_projection_roundtrip():
    intr = jnp.asarray([300.0, 300, 320, 240, 0.02, -0.004, 0.001, 0.0, 0.0])
    rng = np.random.default_rng(2)
    # Wide field: fisheye handles rays far off-axis.
    Xc = rng.uniform([-4, -4, 1.5], [4, 4, 6], size=(400, 3)).astype(np.float32)
    uv = cam.camera_to_pixel(jnp.broadcast_to(intr, (400, 9)), jnp.asarray(Xc),
                             model="fisheye")
    xn = cam.pixel_to_normal(jnp.broadcast_to(intr, (400, 9)), uv,
                             model="fisheye")
    xn_gt = Xc[:, :2] / Xc[:, 2:3]
    np.testing.assert_allclose(np.asarray(xn), xn_gt, atol=1e-3)


def test_spherical_projection_roundtrip():
    W, H = 2048, 1024
    intr = jnp.asarray([W / (2 * np.pi), H / np.pi, W / 2, H / 2, 0, 0, 0],
                       jnp.float32)
    rng = np.random.default_rng(3)
    Xc = rng.normal(size=(300, 3)).astype(np.float32)
    Xc[:, 2] = np.abs(Xc[:, 2]) + 0.5  # forward hemisphere
    uv = cam.camera_to_pixel(jnp.broadcast_to(intr, (300, 7)), jnp.asarray(Xc),
                             model="spherical")
    xn = cam.pixel_to_normal(jnp.broadcast_to(intr, (300, 7)), uv,
                             model="spherical")
    xn_gt = Xc[:, :2] / Xc[:, 2:3]
    np.testing.assert_allclose(np.asarray(xn), xn_gt, atol=2e-3)


def _brown_ba_problem(seed=0, noise_px=0.3):
    rng = np.random.default_rng(seed)
    C, P = 12, 400
    aa = rng.normal(scale=0.1, size=(C, 3)).astype(np.float32)
    t = rng.normal(scale=0.4, size=(C, 3)).astype(np.float32)
    t[:, 2] += 6
    pts = rng.uniform(-2, 2, size=(P, 3)).astype(np.float32)
    intr_gt = np.array([500.0, 500, 320, 240, -0.12, 0.02, 0.0, 0.01, -0.008],
                       np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(aa)))
    ocam = np.repeat(np.arange(C), P // 2)
    opt = np.concatenate([rng.choice(P, P // 2, replace=False)
                          for _ in range(C)]).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", R[ocam], pts[opt]) + t[ocam]
    keep = Xc[:, 2] > 1
    ocam, opt, Xc = ocam[keep], opt[keep], Xc[keep]
    uv = np.array(cam.camera_to_pixel(
        jnp.asarray(np.tile(intr_gt, (len(ocam), 1))), jnp.asarray(Xc)))
    uv = (uv + rng.normal(scale=noise_px, size=uv.shape)).astype(np.float32)
    return dict(C=C, P=P, aa=aa, t=t, pts=pts, intr_gt=intr_gt,
                ocam=ocam, opt=opt, uv=uv, rng=rng)


def test_brown_ba_self_calibration():
    """BA with camera_model='brown' and a shared 9-lane intrinsic group
    recovers k1/k2/t1/t2 started from an undistorted init."""
    d = _brown_ba_problem()
    C, P = d["C"], d["P"]
    rng = d["rng"]
    intr0 = d["intr_gt"].copy()
    intr0[4:9] = 0.0
    cfg = ba.BAConfig(max_iters=30, cg_iters=60, refine_intrinsics=True,
                      refine_params="all", camera_model="brown")
    gi, rot, t, pts, info = ba.bundle_adjust(
        jnp.asarray(np.tile(intr0, (C, 1))),
        jnp.asarray(d["aa"] + rng.normal(scale=0.005, size=(C, 3)).astype(np.float32)),
        jnp.asarray(d["t"]), jnp.ones(C, bool),
        jnp.asarray(d["pts"] + rng.normal(scale=0.02, size=(P, 3)).astype(np.float32)),
        jnp.ones(P, bool), jnp.asarray(d["ocam"]), jnp.asarray(d["opt"]),
        jnp.asarray(d["uv"]), jnp.ones(len(d["ocam"]), bool), cfg=cfg,
        cam_group=jnp.zeros(C, jnp.int32), n_groups=1)
    g = np.asarray(gi)[0]
    assert float(info["final_cost"]) < 0.05 * float(info["initial_cost"])
    gt = d["intr_gt"]
    assert abs(g[4] - gt[4]) < 0.01, f"k1 {g[4]} vs {gt[4]}"
    assert abs(g[7] - gt[7]) < 0.003, f"t1 {g[7]} vs {gt[7]}"
    assert abs(g[8] - gt[8]) < 0.003, f"t2 {g[8]} vs {gt[8]}"


def test_fisheye_ba_converges():
    """BA with camera_model='fisheye' (jacfwd path) reaches the noise floor."""
    d = _brown_ba_problem(seed=4)
    C, P = d["C"], d["P"]
    rng = d["rng"]
    intr_f = np.array([300.0, 300, 320, 240, 0.02, -0.004, 0.001, 0.0, 0.0],
                      np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(d["aa"])))
    Xc = np.einsum("oij,oj->oi", R[d["ocam"]], d["pts"][d["opt"]]) + d["t"][d["ocam"]]
    uv = np.array(cam.camera_to_pixel(
        jnp.asarray(np.tile(intr_f, (len(d["ocam"]), 1))), jnp.asarray(Xc),
        model="fisheye"))
    uv = (uv + rng.normal(scale=0.3, size=uv.shape)).astype(np.float32)
    cfg = ba.BAConfig(max_iters=15, cg_iters=50, camera_model="fisheye")
    _, rot, t, pts, info = ba.bundle_adjust(
        jnp.asarray(np.tile(intr_f, (C, 1))),
        jnp.asarray(d["aa"] + rng.normal(scale=0.01, size=(C, 3)).astype(np.float32)),
        jnp.asarray(d["t"] + rng.normal(scale=0.02, size=(C, 3)).astype(np.float32)),
        jnp.ones(C, bool),
        jnp.asarray(d["pts"] + rng.normal(scale=0.05, size=(P, 3)).astype(np.float32)),
        jnp.ones(P, bool), jnp.asarray(d["ocam"]), jnp.asarray(d["opt"]),
        jnp.asarray(uv), jnp.ones(len(d["ocam"]), bool), cfg=cfg)
    assert float(info["final_cost"]) < 0.05 * float(info["initial_cost"])


def test_brown_e2e_incremental_self_calibration():
    """End-to-end: the incremental engine reconstructs a Brown-distorted
    synthetic scene from 9-lane intrinsics initialized WITHOUT distortion,
    with shared-group self-calibration recovering t1/t2 (verdict 9 'Done')."""
    s = orbit_scene(n_cams=12, n_points=300, noise_px=0.2, seed=7, arc_deg=100.0)
    V = len(s["R"])
    intr_gt = np.concatenate([s["intr"][:4],
                              [-0.10, 0.015, 0.0, 0.008, -0.006]]).astype(np.float32)
    # Re-distort the ideal-pinhole observations through the Brown model:
    # uv_gt are pinhole projections (s["intr"] has k = 0), so map pixel ->
    # normalized -> Brown pixel.
    f = s["intr"][:2]
    c = s["intr"][2:4]
    xn = (s["obs_uv"] - c) / f
    xy = np.concatenate([xn, np.ones((len(xn), 1))], 1).astype(np.float32)
    uv_d = np.array(cam.camera_to_pixel(
        jnp.asarray(np.tile(intr_gt, (len(xn), 1))), jnp.asarray(xy)))
    s = dict(s)
    s["obs_uv"] = uv_d.astype(np.float32)
    kp, track_ids = scene_to_feature_tracks(s)
    n_tracks = int(track_ids.max()) + 1
    intr0 = intr_gt.copy()
    intr0[4:9] = 0.0  # start undistorted — self-calibration must recover
    cfg = incremental.IncrementalConfig(
        ransac_iters=256, pnp_iters=128, ba_every=4,
        ba=ba.BAConfig(max_iters=12, fix_first_cam=False,
                       refine_intrinsics=True, refine_params="all",
                       camera_model="brown"))
    eng = incremental.IncrementalEngine(
        kp, np.tile(intr0, (V, 1)), track_ids, n_tracks, cfg,
        cam_group=np.zeros(V, np.int32))
    scene = eng.run(jax.random.PRNGKey(0))
    reg = np.asarray(scene.cam_mask)
    assert reg.sum() >= 11, f"registered {reg.sum()}; log {eng.log[-4:]}"
    centers = np.asarray(scene.camera_centers())[reg]
    ate = metrics.ate_rmse(centers, s["centers"][reg])
    assert ate < 0.05, f"ATE {ate}; log {eng.log[-4:]}"
    g = np.asarray(scene.intr)[0]
    assert abs(g[4] - intr_gt[4]) < 0.02, f"k1 {g[4]} vs {intr_gt[4]}"
    assert abs(g[7] - intr_gt[7]) < 0.004, f"t1 {g[7]} vs {intr_gt[7]}"
    assert abs(g[8] - intr_gt[8]) < 0.004, f"t2 {g[8]} vs {intr_gt[8]}"
