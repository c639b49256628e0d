"""GPS priors and geo-registration.

The reference extracts per-image GPS EXIF (getGPS,
src/sparseBuilder/sparseBuilder.cpp:112-171) as OpenMVG pose priors.  Here
the same EXIF parse lives in io.images (ImageRecord.gps); this module turns
those priors into a similarity transform that places the reconstruction in
a metric local frame (ENU around the first GPS fix) — the capability the
priors exist for."""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_E2 = 6.69437999014e-3


def lla_to_ecef(lat_deg, lon_deg, alt):
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lon = np.radians(np.asarray(lon_deg, np.float64))
    alt = np.asarray(alt, np.float64)
    n = WGS84_A / np.sqrt(1 - WGS84_E2 * np.sin(lat) ** 2)
    x = (n + alt) * np.cos(lat) * np.cos(lon)
    y = (n + alt) * np.cos(lat) * np.sin(lon)
    z = (n * (1 - WGS84_E2) + alt) * np.sin(lat)
    return np.stack([x, y, z], axis=-1)


def lla_to_enu(lat_deg, lon_deg, alt, ref_lla):
    """Geodetic -> local east/north/up around ref_lla (lat, lon, alt)."""
    ecef = lla_to_ecef(lat_deg, lon_deg, alt)
    ref = lla_to_ecef(*ref_lla)
    lat0 = np.radians(ref_lla[0])
    lon0 = np.radians(ref_lla[1])
    R = np.array([
        [-np.sin(lon0), np.cos(lon0), 0],
        [-np.sin(lat0) * np.cos(lon0), -np.sin(lat0) * np.sin(lon0), np.cos(lat0)],
        [np.cos(lat0) * np.cos(lon0), np.cos(lat0) * np.sin(lon0), np.sin(lat0)],
    ])
    return (ecef - ref) @ R.T


def georegister_scene(scene, gps_list):
    """Similarity-align a reconstruction to GPS camera positions.

    gps_list: per-view (lat, lon, alt) or None.  Needs >= 3 registered views
    with GPS.  Returns (scene aligned into the local ENU metric frame,
    info dict) — poses and points are transformed in place; raises
    ValueError with too few fixes."""
    import jax.numpy as jnp

    from ..core import lie
    from .metrics import umeyama_alignment

    reg = np.asarray(scene.cam_mask)
    have = [i for i, g in enumerate(gps_list) if g is not None and reg[i]]
    if len(have) < 3:
        raise ValueError(f"geo-registration needs >= 3 GPS views, got {len(have)}")
    ref = gps_list[have[0]]
    enu = lla_to_enu(
        [gps_list[i][0] for i in have],
        [gps_list[i][1] for i in have],
        [gps_list[i][2] for i in have],
        ref,
    )
    centers = np.asarray(scene.camera_centers())[have]
    s, R, t = umeyama_alignment(centers, enu, with_scale=True)

    # Apply x' = s R x + t to points and camera poses.
    pts = np.asarray(scene.points) @ (s * R).T + t
    R_cams = np.asarray(lie.so3_exp(scene.cam_rot))
    # x_cam = R_c x + t_c ; with x = (1/s) R^T (x' - t):
    # x_cam = (R_c R^T / s) x' + (t_c - R_c R^T t / s)
    R_new = np.einsum("vij,kj->vik", R_cams, R)
    t_new = np.asarray(scene.cam_t) * s - np.einsum("vij,j->vi", R_new, t)
    # Rescale translation: x_cam' = R_new x' + t_new with scene now metric —
    # keep camera frame scale consistent by scaling t (depth units scale by s).
    aa_new = np.stack([np.asarray(lie.so3_log(jnp.asarray(Rv))) for Rv in R_new])
    out = scene.replace(
        points=jnp.asarray(pts.astype(np.float32)),
        cam_rot=jnp.asarray(aa_new.astype(np.float32)),
        cam_t=jnp.asarray(t_new.astype(np.float32)),
    )
    resid = np.asarray(out.camera_centers())[have] - enu
    return out, {
        "n_gps": len(have),
        "scale": float(s),
        "rms_m": float(np.sqrt((resid ** 2).sum(axis=1).mean())),
        "ref_lla": tuple(ref),
    }


def gps_prior_ba(scene, gps_list, sigma_m: float = 3.0, max_iters: int = 60):
    """GPS as soft priors DURING bundle adjustment (ViewPriors parity,
    src/sparseBuilder/sparseBuilder.cpp:112-171, 506-533): after
    georegister_scene has similarity-aligned the reconstruction into the
    ENU frame, re-run BA with soft camera-center prior residuals at the GPS
    fixes (weight 1/sigma_m^2, from the fix accuracy).  Unlike the post-hoc
    alignment alone, the priors constrain the OPTIMIZATION, bounding
    low-frequency drift on long weak-overlap sequences.  Returns
    (refined scene, info | None)."""
    import jax.numpy as jnp

    from ..ba import bundle_adjust as ba

    reg = np.asarray(scene.cam_mask)
    have = [i for i, g in enumerate(gps_list) if g is not None and reg[i]]
    if len(have) < 3:
        return scene, None
    ref = gps_list[have[0]]
    enu = lla_to_enu(
        [gps_list[i][0] for i in have],
        [gps_list[i][1] for i in have],
        [gps_list[i][2] for i in have],
        ref,
    )
    C = scene.intr.shape[0]
    prior = np.zeros((C, 3), np.float32)
    w = np.zeros(C, np.float32)
    prior[have] = np.asarray(enu, np.float32)
    w[have] = 1.0 / max(sigma_m, 1e-3) ** 2
    # Priors pin the gauge (position + scale), so the first camera unfreezes.
    cfg = ba.BAConfig(max_iters=max_iters, cg_iters=100, fix_first_cam=False,
                      converge_rtol=1e-8)
    intr, rot, t, pts, info = ba.bundle_adjust(
        scene.intr, scene.cam_rot, scene.cam_t, scene.cam_mask,
        scene.points, scene.point_mask, scene.obs_cam, scene.obs_pt,
        scene.obs_uv, scene.obs_mask, cfg=cfg,
        prior_pos=jnp.asarray(prior), prior_weight=jnp.asarray(w),
    )
    out = scene.replace(intr=intr, cam_rot=rot, cam_t=t, points=pts)
    resid = np.asarray(out.camera_centers())[have] - np.asarray(enu)
    return out, {
        "n_gps": len(have),
        "sigma_m": sigma_m,
        "rms_m": float(np.sqrt((resid ** 2).sum(axis=1).mean())),
        "ba_final_cost": float(info["final_cost"]),
    }
