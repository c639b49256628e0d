"""Fused BA linearization kernel (ops/obs_table.py linearize_radial3,
interpret mode) vs the XLA jacfwd reference: identical residuals, Jacobian
products, and segment-reduced normal equations."""

import jax
import jax.numpy as jnp
import numpy as np

from tpusfm.ba import bundle_adjust as ba
from tpusfm.core import lie
from tpusfm.ops import obs_table as ot


def _random_problem(C=6, G=3, P=64, O=400, seed=0, distorted=True):
    r = np.random.default_rng(seed)
    aa = r.normal(scale=0.4, size=(C, 3)).astype(np.float32)
    t = r.normal(scale=0.5, size=(C, 3)).astype(np.float32)
    t[:, 2] += 6.0
    intr = np.tile(np.asarray([400.0, 410.0, 320.0, 240.0, 0, 0, 0],
                              np.float32), (G, 1))
    if distorted:
        intr[:, 4:7] = r.normal(scale=[0.1, 0.02, 0.005], size=(G, 3))
    pts = r.normal(scale=2.0, size=(P, 3)).astype(np.float32)
    obs_cam = r.integers(0, C, size=O).astype(np.int32)
    obs_pt = r.integers(0, P, size=O).astype(np.int32)
    cam_group = (np.arange(C) % G).astype(np.int32)
    obs_grp = cam_group[obs_cam]
    obs_uv = r.normal(scale=200.0, size=(O, 2)).astype(np.float32) + 300.0
    obs_w = (r.random(O) > 0.15).astype(np.float32)
    return dict(aa=aa, t=t, intr=intr, pts=pts, obs_cam=obs_cam,
                obs_pt=obs_pt, obs_grp=obs_grp, obs_uv=obs_uv, obs_w=obs_w,
                cam_group=cam_group)


def _xla_reference(p, refine, refine_mask, delta=4.0):
    """The existing XLA assembly: vmapped jacfwd + einsum products."""
    pose = jnp.concatenate([jnp.asarray(p["aa"]), jnp.asarray(p["t"])], axis=1)
    pose_o = pose[p["obs_cam"]]
    intr_o = jnp.asarray(p["intr"])[p["obs_grp"]]
    X_o = jnp.asarray(p["pts"])[p["obs_pt"]]
    r, Jc, Jg, Jp = ba._obs_jacobians(pose_o, intr_o, X_o,
                                      jnp.asarray(p["obs_uv"]), refine)
    w = (ba._huber_weight(r, delta) * jnp.asarray(p["obs_w"]))[:, None]
    r = r * w
    Jc = Jc * w[..., None]
    Jp = Jp * w[..., None]
    out = dict(
        hcc=jnp.einsum("oki,okj->oij", Jc, Jc).reshape(-1, 36),
        gc=jnp.einsum("oki,ok->oi", Jc, r),
        hpp=jnp.einsum("oki,okj->oij", Jp, Jp).reshape(-1, 9),
        gp=jnp.einsum("oki,ok->oi", Jp, r),
        wc=jnp.einsum("oki,okj->oij", Jc, Jp).reshape(-1, 18),
    )
    if refine:
        rm = jnp.asarray(refine_mask, jnp.float32)
        Jg = Jg * (w[..., None] * rm[None, None, :])
        out.update(
            hcg=jnp.einsum("oki,okj->oij", Jc, Jg).reshape(-1, 42),
            hgg=jnp.einsum("oki,okj->oij", Jg, Jg).reshape(-1, 49),
            gg=jnp.einsum("oki,ok->oi", Jg, r),
            wg=jnp.einsum("oki,okj->oij", Jg, Jp).reshape(-1, 21),
        )
    return out


def _run_fused(p, refine, refine_mask, delta=4.0):
    C, G, P = p["aa"].shape[0], p["intr"].shape[0], p["pts"].shape[0]
    order, ranks, rank_to_pt, rank_valid = ot.sort_and_rank(
        jnp.asarray(p["obs_pt"]), jnp.asarray(p["obs_w"]) > 0, P)
    aa = jnp.asarray(p["aa"])
    R = lie.so3_exp(aa)
    Jr = lie.so3_right_jacobian(aa)
    camtab = jnp.concatenate(
        [jnp.asarray(p["t"]), R.reshape(C, 9), Jr.reshape(C, 9)], axis=1)
    safe = jnp.minimum(rank_to_pt, P - 1)
    pts_rank = jnp.where(rank_valid[:, None], jnp.asarray(p["pts"])[safe], 0.0)
    outs = ot.linearize_radial3(
        camtab, jnp.asarray(p["intr"]), pts_rank,
        jnp.asarray(p["obs_cam"])[order], jnp.asarray(p["obs_grp"])[order],
        ranks, jnp.asarray(p["obs_uv"])[order], jnp.asarray(p["obs_w"])[order],
        refine=refine, refine_mask=refine_mask, huber_delta=delta,
        interpret=True)
    return order, outs


def _assert_close(a, b, label, rtol=2e-4):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.abs(b).max(), 1e-3)
    np.testing.assert_allclose(a, b, atol=rtol * scale, err_msg=label)


def test_linearize_matches_xla_no_refine():
    p = _random_problem(seed=0)
    mask = (0.0,) * 7
    ref = _xla_reference(p, False, mask)
    order, (camvals, ptvals, wc) = _run_fused(p, False, mask)
    inv = np.argsort(np.asarray(order))
    _assert_close(camvals[inv, :36], ref["hcc"], "Hcc")
    _assert_close(camvals[inv, 36:42], ref["gc"], "gc")
    _assert_close(ptvals[inv, :9], ref["hpp"], "Hpp")
    _assert_close(ptvals[inv, 9:], ref["gp"], "gp")
    _assert_close(wc[inv], ref["wc"], "Wc")


def test_linearize_matches_xla_refine_all():
    p = _random_problem(seed=1)
    mask = (1.0,) * 7
    ref = _xla_reference(p, True, mask)
    order, (camvals, ptvals, wc, grpvals, wg) = _run_fused(p, True, mask)
    inv = np.argsort(np.asarray(order))
    _assert_close(camvals[inv, :36], ref["hcc"], "Hcc")
    _assert_close(camvals[inv, 36:42], ref["gc"], "gc")
    _assert_close(camvals[inv, 42:84], ref["hcg"], "Hcg")
    _assert_close(ptvals[inv, :9], ref["hpp"], "Hpp")
    _assert_close(ptvals[inv, 9:], ref["gp"], "gp")
    _assert_close(wc[inv], ref["wc"], "Wc")
    _assert_close(grpvals[inv, :49], ref["hgg"], "Hgg")
    _assert_close(grpvals[inv, 49:], ref["gg"], "gg")
    _assert_close(wg[inv], ref["wg"], "Wg")


def test_linearize_matches_xla_focal_mask():
    p = _random_problem(seed=2, distorted=False)
    mask = (1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    ref = _xla_reference(p, True, mask)
    order, (camvals, ptvals, wc, grpvals, wg) = _run_fused(p, True, mask)
    inv = np.argsort(np.asarray(order))
    _assert_close(camvals[inv, 42:84], ref["hcg"], "Hcg")
    _assert_close(grpvals[inv, :49], ref["hgg"], "Hgg")
    _assert_close(wg[inv], ref["wg"], "Wg")


def test_full_solve_fused_matches_unfused():
    """End-to-end LM: fused linearization vs the jacfwd assembly on the
    pallas path reach the same solution."""
    from synth import orbit_scene

    C, P = 10, 250
    s = orbit_scene(n_cams=C, n_points=P, noise_px=0.8, seed=2, arc_deg=200.0)
    r = np.random.default_rng(3)
    args = dict(
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
        obs_mask=jnp.ones(len(s["obs_cam"]), bool),
    )
    kw = dict(max_iters=6, cg_iters=30, impl="pallas", pallas_interpret=True)
    _, rf, tf, _, inff = ba.bundle_adjust(
        cfg=ba.BAConfig(fused_linearize=True, **kw), **args)
    _, ru, tu, _, infu = ba.bundle_adjust(
        cfg=ba.BAConfig(fused_linearize=False, **kw), **args)
    assert float(inff["final_cost"]) < float(inff["initial_cost"]) * 0.5
    assert abs(float(inff["final_cost"]) - float(infu["final_cost"])) \
        < 0.05 * max(float(infu["final_cost"]), 1.0)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(ru), atol=1e-3)
    np.testing.assert_allclose(np.asarray(tf), np.asarray(tu), atol=5e-3)


def test_full_solve_fused_matches_unfused_refine():
    """End-to-end LM with refine_intrinsics=True and a SHARED intrinsic
    group: the fused refine wiring (grpvals/wg through grp_reduce and the
    Schur Wg coupling) vs the jacfwd assembly reach the same solution
    (advisor finding, round 2: this path was only covered by
    single-linearization parity tests)."""
    from synth import orbit_scene

    C, P = 10, 250
    s = orbit_scene(n_cams=C, n_points=P, noise_px=0.8, seed=5, arc_deg=200.0)
    r = np.random.default_rng(7)
    intr = np.tile(s["intr"], (C, 1)).astype(np.float32)
    intr[:, 0] *= 1.03  # focal error for self-calibration to absorb
    intr[:, 1] *= 1.03
    args = dict(
        intr=jnp.asarray(intr),
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
        obs_mask=jnp.ones(len(s["obs_cam"]), bool),
        cam_group=jnp.zeros(C, jnp.int32),
        n_groups=1,
    )
    kw = dict(max_iters=8, cg_iters=30, impl="pallas", pallas_interpret=True,
              refine_intrinsics=True, refine_params="all")
    gf, rf, tf, _, inff = ba.bundle_adjust(
        cfg=ba.BAConfig(fused_linearize=True, **kw), **args)
    gu, ru, tu, _, infu = ba.bundle_adjust(
        cfg=ba.BAConfig(fused_linearize=False, **kw), **args)
    assert float(inff["final_cost"]) < float(inff["initial_cost"]) * 0.5
    assert abs(float(inff["final_cost"]) - float(infu["final_cost"])) \
        < 0.05 * max(float(infu["final_cost"]), 1.0)
    # Self-calibration couples focal with depth/pose (a near-gauge
    # direction), so the two Jacobian paths' ~2e-4 relative differences
    # amplify into ~1e-2 pose differences at matched cost — compare with
    # tolerances that reflect that, plus the refined focal agreement.
    np.testing.assert_allclose(np.asarray(rf), np.asarray(ru), atol=2e-2)
    np.testing.assert_allclose(np.asarray(tf), np.asarray(tu), atol=5e-2)
    np.testing.assert_allclose(np.asarray(gf)[:, :2], np.asarray(gu)[:, :2],
                               rtol=5e-3)
