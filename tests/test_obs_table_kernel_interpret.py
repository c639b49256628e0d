"""Execute the ACTUAL T-layout pallas kernel bodies under interpret mode.

ADVICE r4 item 3: the suite's interpret=True paths short-circuit the fused
kernels to compositions of pre-existing (separately verified) kernels, so
a regression in `_linearize_reduce_t_kernel`, `_schur_mv_t_kernel`,
`_schur_bwd_t_kernel` or the span-chunked window one-hots would pass CI
and only be caught by the manual on-chip script (scripts/ba_fused_check.py).
These tests call the wrappers with ``interpret="kernel"``, which runs the
real kernel body (span one-hot builds, lane-window dynamic slices, packed
outputs) in pallas interpret mode on CPU, and checks against numpy.

Shapes are kept small-ish (one-to-few BL_T blocks) so the interpreter cost
stays in seconds; the span path's correctness depends on dense sorted
ranks, which the fixture guarantees via np.unique relabeling.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusfm.ops import obs_table as ot


@pytest.fixture(scope="module")
def prob():
    O, P, C = 20000, 3000, 50
    r = np.random.default_rng(7)
    ranks = np.sort(r.integers(0, P, size=O)).astype(np.int32)
    _, inv = np.unique(ranks, return_inverse=True)
    ranks = inv.astype(np.int32)      # dense sorted
    p = int(ranks.max()) + 1
    cam = r.integers(0, C, size=O).astype(np.int32)
    return dict(O=O, p=p, C=C, ranks=ranks, cam=cam, rng=r)


def test_schur_bwd_t_kernel_body(prob):
    O, p, C = prob["O"], prob["p"], prob["C"]
    r = prob["rng"]
    wT = r.normal(size=(18, O)).astype(np.float32)
    ztab = r.normal(size=(p, 3)).astype(np.float32)
    out = ot.schur_bwd_t(jnp.asarray(wT), jnp.asarray(prob["cam"]),
                         jnp.asarray(prob["ranks"]), jnp.asarray(ztab), C,
                         interpret="kernel")
    zg = ztab[prob["ranks"]]                            # (O, 3)
    bk = np.einsum("dko,ok->do", wT.reshape(6, 3, O), zg)
    ref = np.zeros((C, 6), np.float32)
    np.add.at(ref, prob["cam"], bk.T)
    np.testing.assert_allclose(np.asarray(out), ref,
                               rtol=2e-5, atol=2e-4 * np.abs(ref).max())


def test_schur_mv_t_kernel_body(prob):
    O, p, C = prob["O"], prob["p"], prob["C"]
    r = prob["rng"]
    wT = r.normal(size=(18, O)).astype(np.float32)
    vtab = r.normal(size=(C, 6)).astype(np.float32)
    hinv = r.normal(size=(p, 3, 3)).astype(np.float32) * 0.1
    hcc = r.normal(size=(C, 6, 6)).astype(np.float32)
    bc, y = ot.schur_mv_t(jnp.asarray(wT), jnp.asarray(prob["cam"]),
                          jnp.asarray(prob["ranks"]), jnp.asarray(vtab),
                          jnp.asarray(hinv), p, hcc_d=jnp.asarray(hcc),
                          interpret="kernel")
    W = wT.reshape(6, 3, O)
    vg = vtab[prob["cam"]]                              # (O, 6)
    wv = np.einsum("dko,od->ko", W, vg)                 # (3, O)
    y_ref = np.zeros((p, 3), np.float32)
    np.add.at(y_ref, prob["ranks"], wv.T)
    z = np.einsum("pij,pj->pi", hinv, y_ref)
    zg = z[prob["ranks"]]
    bk = np.einsum("dko,ok->do", W, zg)
    b_ref = np.zeros((C, 6), np.float32)
    np.add.at(b_ref, prob["cam"], bk.T)
    sv_ref = np.einsum("cij,cj->ci", hcc, vtab) - b_ref
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-5,
                               atol=2e-4 * np.abs(y_ref).max())
    np.testing.assert_allclose(np.asarray(bc), sv_ref, rtol=2e-4,
                               atol=5e-4 * np.abs(sv_ref).max())


def test_segsum_sorted_t_kernel_body(prob):
    O, p = prob["O"], prob["p"]
    r = prob["rng"]
    vals = r.normal(size=(12, O)).astype(np.float32)
    out = ot.segsum_sorted_t(jnp.asarray(vals), jnp.asarray(prob["ranks"]),
                             p, interpret="kernel")
    ref = np.zeros((p, 12), np.float32)
    np.add.at(ref, prob["ranks"], vals.T)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5,
                               atol=2e-4 * np.abs(ref).max())


def test_schur_fwd_t_kernel_body(prob):
    O, p, C = prob["O"], prob["p"], prob["C"]
    r = prob["rng"]
    wT = r.normal(size=(18, O)).astype(np.float32)
    vtab = r.normal(size=(C, 6)).astype(np.float32)
    out = ot.schur_fwd_t(jnp.asarray(wT), jnp.asarray(prob["cam"]),
                         jnp.asarray(prob["ranks"]), jnp.asarray(vtab), p,
                         interpret="kernel")
    W = wT.reshape(6, 3, O)
    wv = np.einsum("dko,od->ko", W, vtab[prob["cam"]])
    ref = np.zeros((p, 3), np.float32)
    np.add.at(ref, prob["ranks"], wv.T)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5,
                               atol=2e-4 * np.abs(ref).max())


def test_linearize_reduce_kernel_body_vs_delegate():
    """The real fused kernel (packed one-hot reuse, span window chunks)
    against the interpret=True delegate (unfused kernels + XLA segsums) on
    a geometrically valid synthetic BA problem — both refine modes."""
    from test_obs_table import _tiny_ba_tables

    (camtab, intr, pts_rank, obs_cam, ranks, obs_uvT, obs_w,
     C, P) = _tiny_ba_tables()
    args = (camtab, intr, pts_rank, obs_cam, obs_cam, ranks, obs_uvT, obs_w)
    for refine in (False, True):
        rm = (1.0,) * 7 if refine else (0.0,) * 7
        real = ot.linearize_reduce_radial3_t(
            *args, refine=refine, refine_mask=rm, huber_delta=4.0,
            interpret="kernel")
        ref = ot.linearize_reduce_radial3_t(
            *args, refine=refine, refine_mask=rm, huber_delta=4.0,
            interpret=True)
        for a, b, name in zip(real, ref,
                              ("camred", "ptred", "wcT", "grpred", "wgT")):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            scale = max(np.abs(b).max(), 1e-6)
            np.testing.assert_allclose(
                a, b, rtol=5e-3, atol=5e-4 * scale,
                err_msg=f"refine={refine} {name}")
