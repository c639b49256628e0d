"""GPS priors DURING bundle adjustment bound drift on long weak-overlap
sequences (round-2 verdict item 10; ViewPriors parity,
src/sparseBuilder/sparseBuilder.cpp:112-171, 506-533).

A 40-camera corridor where each point is visible from only ~4 consecutive
views has near-null low-frequency bending modes: a smoothly curled version
of the truth reprojects almost as well, so plain BA started from the curled
poses stays curled.  Soft camera-center priors at the true positions pull
the solution back."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusfm.ba import bundle_adjust as ba


@pytest.fixture(scope="module")
def corridor():
    rng = np.random.default_rng(0)
    C = 40
    P_per = 40           # points born per camera station
    f, cx, cy = 400.0, 320.0, 240.0
    intr = np.tile([f, f, cx, cy, 0, 0, 0], (C, 1)).astype(np.float32)
    # Cameras marching along +x, looking forward (+z world = +z cam).
    t_gt = np.zeros((C, 3), np.float32)
    centers = np.stack([np.arange(C) * 1.0,
                        np.zeros(C), np.zeros(C)], 1).astype(np.float32)
    aa_gt = np.zeros((C, 3), np.float32)  # identity rotations
    t_gt = -centers  # t = -R C with R = I
    # Points ahead of their birth camera, z in [4, 8], small xy spread.
    pts = []
    for c in range(C):
        p = rng.uniform([-2, -2, 4], [2, 2, 8], size=(P_per, 3))
        p[:, 0] += centers[c, 0]
        pts.append(p)
    pts = np.concatenate(pts).astype(np.float32)
    P = len(pts)
    # Visibility: each point seen by its birth camera and the next 3.
    ocam, opt = [], []
    for c in range(C):
        for k in range(4):
            cc = c + k
            if cc < C:
                ocam.append(np.full(P_per, cc, np.int32))
                opt.append(np.arange(c * P_per, (c + 1) * P_per, dtype=np.int32))
    ocam = np.concatenate(ocam)
    opt = np.concatenate(opt)
    Xc = pts[opt] - centers[ocam]
    keep = Xc[:, 2] > 0.5
    ocam, opt, Xc = ocam[keep], opt[keep], Xc[keep]
    uv = Xc[:, :2] / Xc[:, 2:3] * f + np.array([cx, cy], np.float32)
    uv = (uv + rng.normal(scale=0.3, size=uv.shape)).astype(np.float32)

    # Drifted init: smooth vertical curl growing quadratically along x,
    # applied CONSISTENTLY to cameras and points — the drifted
    # configuration reprojects almost as well as the truth (a near-null
    # bending mode of the weak-overlap graph), so plain BA stays there.
    def curl_y(x):
        return 0.004 * np.clip(x, 0, None) ** 2

    centers_bad = centers.copy()
    centers_bad[:, 1] += curl_y(np.arange(C).astype(np.float32))
    t_bad = -centers_bad
    pts_bad = pts.copy()
    pts_bad[:, 1] += curl_y(pts[:, 0])
    return dict(C=C, P=P, intr=intr, aa=aa_gt, t_gt=t_gt, t_bad=t_bad,
                centers=centers, pts=pts, pts_bad=pts_bad, ocam=ocam,
                opt=opt, uv=uv, curl_max=float(curl_y(C - 1)))


def _solve(d, prior):
    C, P = d["C"], d["P"]
    kw = dict(
        intr=jnp.asarray(d["intr"]),
        cam_rot=jnp.asarray(d["aa"]),
        cam_t=jnp.asarray(d["t_bad"]),
        cam_mask=jnp.ones(C, bool),
        points=jnp.asarray(d["pts_bad"]),
        point_mask=jnp.ones(P, bool),
        obs_cam=jnp.asarray(d["ocam"]),
        obs_pt=jnp.asarray(d["opt"]),
        obs_uv=jnp.asarray(d["uv"]),
        obs_mask=jnp.ones(len(d["ocam"]), bool),
    )
    if prior:
        kw["prior_pos"] = jnp.asarray(d["centers"])
        # RTK-class fixes (sigma 0.2 m): strong enough to steepen the
        # near-null bending valley — with sigma >= 0.5 m LM stalls in a
        # local compromise at ~1.4 m drift (measured), which is itself the
        # honest statement of what GPS accuracy buys.
        kw["prior_weight"] = jnp.full(C, 1.0 / 0.2 ** 2)
        cfg = ba.BAConfig(max_iters=40, cg_iters=100, fix_first_cam=False)
    else:
        cfg = ba.BAConfig(max_iters=40, cg_iters=100)
    intr, rot, t, pts, info = ba.bundle_adjust(cfg=cfg, **kw)
    from tpusfm.core import lie
    R = np.asarray(lie.so3_exp(rot))
    centers = -np.einsum("cji,cj->ci", R, np.asarray(t))
    err = np.linalg.norm(centers - d["centers"], axis=1)
    return float(np.sqrt((err ** 2).mean())), info


def test_gps_priors_bound_drift(corridor):
    rms_free, info_free = _solve(corridor, prior=False)
    rms_prior, info_prior = _solve(corridor, prior=True)
    # Both converge in reprojection terms...
    assert float(info_free["final_cost"]) < float(info_free["initial_cost"])
    assert float(info_prior["final_cost"]) < float(info_prior["initial_cost"])
    # ...but only the prior-constrained solve removes the curl.  The free
    # solve keeps a drift on the order of the injected curl (its bending
    # mode is near-null for reprojection — how much of it survives depends
    # on the exact LM path); the priors pin it.
    assert rms_prior < 0.5 * rms_free, (rms_prior, rms_free)
    assert rms_prior < 0.3, rms_prior
    assert rms_free > 0.45, rms_free  # the drift mode really is retained


def test_gps_prior_ba_helper(corridor):
    """utils.geo.gps_prior_ba end-to-end on a Scene (ENU = world here)."""
    from tpusfm.sfm.scene import Scene
    from tpusfm.utils import geo

    d = corridor
    C, P = d["C"], d["P"]
    scene = Scene(
        intr=jnp.asarray(d["intr"]), cam_rot=jnp.asarray(d["aa"]),
        cam_t=jnp.asarray(d["t_bad"]), cam_mask=jnp.ones(C, bool),
        points=jnp.asarray(d["pts_bad"]), colors=jnp.zeros((P, 3), jnp.uint8),
        point_mask=jnp.ones(P, bool), obs_cam=jnp.asarray(d["ocam"]),
        obs_pt=jnp.asarray(d["opt"]), obs_uv=jnp.asarray(d["uv"]),
        obs_mask=jnp.ones(len(d["ocam"]), bool))
    # Synthesize GPS fixes whose ENU frame equals the world frame: the
    # first camera is the ENU origin, +x east, +y north, +z up.
    ref = (47.0, 8.0, 500.0)
    lat0, lon0, alt0 = ref
    import math
    a, f_ = 6378137.0, 1.0 / 298.257223563
    # Small-offset inversion of lla_to_enu (good to ~1e-7 at 40 m extent).
    e2 = f_ * (2 - f_)
    s_lat = math.sin(math.radians(lat0))
    Rn = a / math.sqrt(1 - e2 * s_lat ** 2)
    Rm = Rn * (1 - e2) / (1 - e2 * s_lat ** 2)
    gps_list = []
    for c in range(C):
        e_, n_, u_ = d["centers"][c]
        gps_list.append((lat0 + math.degrees(n_ / Rm),
                         lon0 + math.degrees(e_ / (Rn * math.cos(math.radians(lat0)))),
                         alt0 + float(u_)))
    out, info = geo.gps_prior_ba(scene, gps_list, sigma_m=0.2)
    assert info is not None and info["n_gps"] == C
    centers = np.asarray(out.camera_centers())
    # ENU of the synthesized fixes reproduces d["centers"] to ~3 mm.  The
    # corridor's bending valley is flat enough that the exact LM endpoint is
    # path-sensitive (mm-level prior perturbations shift which basin LM
    # settles in); the robust claim is RELATIVE: the prior solve must cut
    # the injected drift (~2.7 m rms) several-fold.
    err = np.linalg.norm(centers - d["centers"], axis=1)
    rms = float(np.sqrt((err ** 2).mean()))
    init_err = np.linalg.norm(-d["t_bad"] - d["centers"], axis=1)
    init_rms = float(np.sqrt((init_err ** 2).mean()))
    assert rms < 0.25 * init_rms, (rms, init_rms)
