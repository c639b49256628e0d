"""BA pallas path (ops/obs_table.py kernels, interpret mode) vs the XLA
path: same problem, equivalent solution."""

import jax.numpy as jnp
import numpy as np

from synth import orbit_scene
from tpusfm.ba import bundle_adjust as ba


def _problem(C=12, P=300, noise=1.5, seed=0):
    s = orbit_scene(n_cams=C, n_points=P, noise_px=0.8, seed=seed, arc_deg=200.0)
    O = len(s["obs_cam"])
    r = np.random.default_rng(seed + 1)
    return dict(
        intr=jnp.asarray(np.tile(s["intr"], (C, 1))),
        cam_rot=jnp.asarray(s["aa"] + r.normal(scale=0.01, size=(C, 3)),
                            jnp.float32),
        cam_t=jnp.asarray(s["t"] + r.normal(scale=0.02, size=(C, 3)),
                          jnp.float32),
        cam_mask=jnp.ones(C, bool),
        points=jnp.asarray(s["points"] + r.normal(scale=0.05, size=(P, 3)),
                           jnp.float32),
        point_mask=jnp.asarray(s["point_valid"]),
        obs_cam=jnp.asarray(s["obs_cam"]),
        obs_pt=jnp.asarray(s["obs_pt"]),
        obs_uv=jnp.asarray(s["obs_uv"]),
        obs_mask=jnp.ones(O, bool),
    )


def test_pallas_path_matches_xla():
    args = _problem()
    # dense_schur_max_dim=0 keeps the XLA side on the same PCG algorithm as
    # the pallas path, so the comparison isolates the segment-sum kernels.
    # (With the dense direct solve enabled the two sides take different —
    # both exact — solve algorithms and drift apart along the scene's scale
    # gauge freedom while reaching the same cost.)
    cfg_x = ba.BAConfig(max_iters=8, cg_iters=40, impl="xla",
                        dense_schur_max_dim=0)
    cfg_p = ba.BAConfig(max_iters=8, cg_iters=40, impl="pallas",
                        pallas_interpret=True)
    ix, rx, tx, px, infx = ba.bundle_adjust(cfg=cfg_x, **args)
    ip, rp, tp, pp, infp = ba.bundle_adjust(cfg=cfg_p, **args)

    # Both converge to the same cost basin.
    fx = float(infx["final_cost"])
    fp = float(infp["final_cost"])
    assert fp < float(infp["initial_cost"]) * 0.5
    assert abs(fx - fp) < 0.05 * max(fx, 1.0)
    # Camera parameters agree.
    np.testing.assert_allclose(np.asarray(rp), np.asarray(rx), atol=5e-4)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(tx), atol=5e-3)


def test_pallas_path_masked_obs_and_points():
    args = _problem(C=8, P=200, seed=3)
    O = args["obs_cam"].shape[0]
    rng = np.random.default_rng(0)
    keep = jnp.asarray(rng.random(O) > 0.3)
    args["obs_mask"] = args["obs_mask"] & keep
    pm = np.asarray(args["point_mask"]).copy()
    pm[:20] = False
    args["point_mask"] = jnp.asarray(pm)

    cfg_p = ba.BAConfig(max_iters=5, cg_iters=30, impl="pallas",
                        pallas_interpret=True)
    cfg_x = ba.BAConfig(max_iters=5, cg_iters=30, impl="xla",
                        dense_schur_max_dim=0)
    ip, rp, tp, pp, infp = ba.bundle_adjust(cfg=cfg_p, **args)
    ix, rx, tx, px, infx = ba.bundle_adjust(cfg=cfg_x, **args)
    assert float(infp["final_cost"]) <= float(infp["initial_cost"])
    assert abs(float(infp["final_cost"]) - float(infx["final_cost"])) \
        < 0.05 * max(float(infx["final_cost"]), 1.0)
    # Masked points never move.
    np.testing.assert_allclose(np.asarray(pp)[:20],
                               np.asarray(args["points"])[:20])
    # Masked-out observations of masked points do not poison cameras.
    assert np.isfinite(np.asarray(tp)).all()


def test_pallas_path_respects_frozen_cameras():
    args = _problem(C=8, P=200, seed=5)
    free = np.ones(8, bool)
    free[3] = False
    cfg_p = ba.BAConfig(max_iters=4, cg_iters=25, impl="pallas",
                        pallas_interpret=True)
    ip, rp, tp, pp, infp = ba.bundle_adjust(
        cfg=cfg_p, cam_free_mask=jnp.asarray(free), **args
    )
    np.testing.assert_allclose(np.asarray(rp)[3], np.asarray(args["cam_rot"])[3])
    np.testing.assert_allclose(np.asarray(tp)[3], np.asarray(args["cam_t"])[3])
    # Gauge: camera 0 frozen too.
    np.testing.assert_allclose(np.asarray(rp)[0], np.asarray(args["cam_rot"])[0])


def _sort_relabel(args):
    """Host-side point-sort + dense relabel satisfying the assume_sorted
    contract (BAConfig.assume_sorted): rows ordered by point id, observed
    ids renumbered 0..K-1, unobserved points moved to the tail."""
    obs_pt = np.asarray(args["obs_pt"])
    obs_cam = np.asarray(args["obs_cam"])
    obs_uv = np.asarray(args["obs_uv"])
    obs_mask = np.asarray(args["obs_mask"])
    points = np.asarray(args["points"])
    pmask = np.asarray(args["point_mask"])
    P = len(points)
    observed = np.zeros(P, bool)
    observed[obs_pt] = True
    new_of = np.full(P, -1, np.int64)
    obs_ids = np.nonzero(observed)[0]
    new_of[obs_ids] = np.arange(len(obs_ids))
    rest = np.nonzero(~observed)[0]
    new_of[rest] = len(obs_ids) + np.arange(len(rest))
    perm = np.argsort(new_of)  # new index -> old index
    order = np.argsort(new_of[obs_pt], kind="stable")
    out = dict(args)
    out["points"] = jnp.asarray(points[perm])
    out["point_mask"] = jnp.asarray(pmask[perm])
    out["obs_pt"] = jnp.asarray(new_of[obs_pt][order].astype(np.int32))
    out["obs_cam"] = jnp.asarray(obs_cam[order])
    out["obs_uv"] = jnp.asarray(obs_uv[order])
    out["obs_mask"] = jnp.asarray(obs_mask[order])
    return out, perm


def test_pallas_assume_sorted_matches_unsorted():
    """assume_sorted skips the in-solve sort; on a host-presorted problem it
    must match the sorting pallas path (identical algorithm thereafter)."""
    args = _problem(C=10, P=250, seed=5)
    # Mask some observations so weight-0 rows interleave (the contract keeps
    # them in place with their point id).
    O = args["obs_cam"].shape[0]
    rng = np.random.default_rng(2)
    args["obs_mask"] = jnp.asarray(rng.random(O) > 0.2)
    sorted_args, perm = _sort_relabel(args)
    cfg_ref = ba.BAConfig(max_iters=6, cg_iters=30, impl="pallas",
                          pallas_interpret=True)
    cfg_fast = ba.BAConfig(max_iters=6, cg_iters=30, impl="pallas",
                           pallas_interpret=True, assume_sorted=True)
    i0, r0, t0, p0, inf0 = ba.bundle_adjust(cfg=cfg_ref, **args)
    i1, r1, t1, p1, inf1 = ba.bundle_adjust(cfg=cfg_fast, **sorted_args)
    f0 = float(inf0["final_cost"])
    f1 = float(inf1["final_cost"])
    assert f1 < float(inf1["initial_cost"]) * 0.9
    assert abs(f0 - f1) < 0.02 * max(f0, 1.0), (f0, f1)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), atol=5e-3)
    # Points come back in the relabeled order.
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0)[perm], atol=2e-2)
