"""Pallas observation-table primitives vs XLA oracles (interpret mode on the
CPU mesh; the real TPU path is exercised by bench.py through BA)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpusfm.ops import obs_table as ot


def test_gather_table_matches_indexing():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.random((37, 13), np.float32))
    idx = jnp.asarray(rng.integers(0, 37, 1200).astype(np.int32))
    out = ot.gather_table(tab, idx, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(tab)[np.asarray(idx)],
                               rtol=1e-6)
    # Out-of-range ids -> zero rows.
    idx2 = idx.at[5].set(37).at[100].set(1000)
    out2 = ot.gather_table(tab, idx2, interpret=True)
    assert np.all(np.asarray(out2)[5] == 0) and np.all(np.asarray(out2)[100] == 0)


def test_segsum_table_matches_segment_sum():
    rng = np.random.default_rng(1)
    O, N, D = 3000, 41, 6
    vals = jnp.asarray(rng.normal(size=(O, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, O).astype(np.int32))
    out = ot.segsum_table(vals, idx, N, interpret=True)
    ref = jax.ops.segment_sum(vals, idx, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # ids >= N dropped
    idx2 = idx.at[0].set(N)
    out2 = ot.segsum_table(vals, idx2, N, interpret=True)
    ref2 = jax.ops.segment_sum(vals[1:], idx[1:], N)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-4)


def _sorted_dense_ids(rng, O, P):
    """Sorted dense rank-like ids: nondecreasing, gaps of exactly 1."""
    counts = rng.integers(1, 9, P)
    ids = np.repeat(np.arange(P), counts)
    return ids[:O] if len(ids) >= O else np.concatenate(
        [ids, np.full(O - len(ids), P - 1)]
    )


def test_gather_sorted_matches_indexing():
    rng = np.random.default_rng(2)
    O, P, D = 4000, 900, 3
    ids = np.sort(_sorted_dense_ids(rng, O, P)).astype(np.int32)
    tab = jnp.asarray(rng.random((P, D), np.float32))
    out = ot.gather_sorted(tab, jnp.asarray(ids), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(tab)[ids], rtol=1e-6)


def test_segsum_sorted_matches_segment_sum():
    rng = np.random.default_rng(3)
    O, P, D = 4000, 900, 12
    ids = np.sort(_sorted_dense_ids(rng, O, P)).astype(np.int32)
    vals = jnp.asarray(rng.normal(size=(O, D)).astype(np.float32))
    out = ot.segsum_sorted(vals, jnp.asarray(ids), P, interpret=True)
    ref = jax.ops.segment_sum(vals, jnp.asarray(ids), P)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_segsum_sorted_window_straddles_blocks():
    # One segment spanning a block boundary plus ids whose window base is in
    # the previous block — the j in {0,1} two-half accumulation must catch it.
    O, P, D = 1100, 600, 4
    ids = np.concatenate([
        np.full(500, 0), np.full(24, 1), np.full(576, 2)
    ]).astype(np.int32)[:O]
    rng = np.random.default_rng(4)
    vals = jnp.asarray(rng.normal(size=(O, D)).astype(np.float32))
    out = ot.segsum_sorted(vals, jnp.asarray(ids), P, interpret=True)
    ref = jax.ops.segment_sum(vals, jnp.asarray(ids), P)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_sort_and_rank():
    rng = np.random.default_rng(5)
    O, S = 500, 64
    seg = jnp.asarray(rng.integers(0, S, O).astype(np.int32))
    valid = jnp.asarray(rng.random(O) > 0.2)
    order, ranks, rank_to_seg, rank_valid = ot.sort_and_rank(seg, valid, S)
    seg_s = np.asarray(seg)[np.asarray(order)]
    valid_s = np.asarray(valid)[np.asarray(order)]
    ranks = np.asarray(ranks)
    # Valid rows first, ranks dense and nondecreasing.
    nv = valid_s.sum()
    assert valid_s[:nv].all() and not valid_s[nv:].any()
    r = ranks[:nv]
    assert r[0] == 0 and np.all(np.diff(r) >= 0) and np.all(np.diff(r) <= 1)
    # Rank maps back to the right original segment id.
    r2s = np.asarray(rank_to_seg)
    assert np.all(r2s[r] == seg_s[:nv])
    assert np.asarray(rank_valid)[: r.max() + 1].all()
    # Invalid rows ranked out of range.
    assert (ranks[nv:] >= S).all()
    # Round-trip: segment sums via ranks equal direct segment sums.
    vals = rng.normal(size=(O, 2)).astype(np.float32)
    vs = jnp.asarray(vals)[jnp.asarray(order)]
    by_rank = jax.ops.segment_sum(
        vs * valid_s[:, None], jnp.minimum(jnp.asarray(ranks), S), S + 1
    )[:S]
    direct = jax.ops.segment_sum(jnp.asarray(vals) * np.asarray(valid)[:, None],
                                 seg, S)
    scattered = np.zeros((S, 2), np.float32)
    rv = np.asarray(rank_valid)
    scattered[r2s[rv]] = np.asarray(by_rank)[rv]
    np.testing.assert_allclose(scattered, np.asarray(direct), atol=1e-5)


def _tiny_ba_tables(seed=5, C=7, P=60, O=400):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from synth import orbit_scene

    from tpusfm.core import lie

    rng = np.random.default_rng(seed)
    s = orbit_scene(n_cams=C, n_points=P, noise_px=0.5, seed=seed,
                    arc_deg=200.0, vis_prob=0.9)
    obs_cam = jnp.asarray(s["obs_cam"])
    obs_pt = jnp.asarray(s["obs_pt"])
    obs_uv = jnp.asarray(s["obs_uv"], jnp.float32)
    o = obs_cam.shape[0]
    valid = jnp.asarray(rng.random(o) > 0.1)
    order, ranks, r2p, rv = ot.sort_and_rank(obs_pt, valid, P)
    obs_cam = obs_cam[order]
    obs_uvT = obs_uv[order].T
    obs_w = valid[order].astype(jnp.float32)
    pose = jnp.asarray(np.concatenate([s["aa"], s["t"]], 1), jnp.float32)
    R = lie.so3_exp(pose[:, :3])
    Jr = lie.so3_right_jacobian(pose[:, :3])
    camtab = jnp.concatenate([pose[:, 3:6], R.reshape(C, 9),
                              Jr.reshape(C, 9)], axis=1)
    pts = jnp.asarray(s["points"], jnp.float32)
    pts_rank = jnp.where(rv[:, None], pts[jnp.minimum(r2p, P - 1)], 0.0)
    intr = jnp.asarray(np.tile(s["intr"], (C, 1)))
    return camtab, intr, pts_rank, obs_cam, ranks, obs_uvT, obs_w, C, P


def test_linearize_reduce_matches_separate_path():
    """Fused linearize+reduce (packed symmetric) vs linearize + XLA segment
    sums, both refine modes — validates the packed layouts and the
    _FULL66/_FULL33/_FULL77 reconstruction maps."""
    (camtab, intr, pts_rank, obs_cam, ranks, obs_uvT, obs_w,
     C, P) = _tiny_ba_tables()
    for refine in (False, True):
        rm = (1.0,) * 7 if refine else (0.0,) * 7
        fused = ot.linearize_reduce_radial3_t(
            camtab, intr, pts_rank, obs_cam, obs_cam, ranks, obs_uvT, obs_w,
            refine=refine, refine_mask=rm, huber_delta=4.0, interpret=True)
        sep = ot.linearize_radial3_t(
            camtab, intr, pts_rank, obs_cam, obs_cam, ranks, obs_uvT, obs_w,
            refine=refine, refine_mask=rm, huber_delta=4.0, interpret=True)
        camred = np.asarray(jax.ops.segment_sum(sep[0].T, obs_cam, C))
        ptred = np.asarray(jax.ops.segment_sum(
            sep[1].T, jnp.minimum(ranks, P), P + 1)[:P])
        # Full Hcc from the packed columns == the unpacked reduction.
        got_hcc = np.asarray(fused[0])[:, np.asarray(ot._FULL66)].reshape(C, 6, 6)
        np.testing.assert_allclose(got_hcc, camred[:, :36].reshape(C, 6, 6),
                                   rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(fused[0])[:, 21:27],
                                   camred[:, 36:42], rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(fused[0])[:, -1],
                                   camred[:, -1], rtol=2e-5, atol=1e-4)
        got_hpp = np.asarray(fused[1])[:, np.asarray(ot._FULL33)].reshape(P, 3, 3)
        np.testing.assert_allclose(got_hpp, ptred[:, :9].reshape(P, 3, 3),
                                   rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(fused[1])[:, 6:9],
                                   ptred[:, 9:12], rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(fused[2]), np.asarray(sep[2]),
                                   rtol=1e-6, atol=1e-6)
        if refine:
            np.testing.assert_allclose(np.asarray(fused[0])[:, 27:69],
                                       camred[:, 42:84], rtol=2e-5, atol=1e-4)
            grpred = np.asarray(jax.ops.segment_sum(sep[3].T, obs_cam, C))
            got_hgg = np.asarray(fused[3])[:, np.asarray(ot._FULL77)].reshape(
                C, 7, 7)
            np.testing.assert_allclose(got_hgg, grpred[:, :49].reshape(C, 7, 7),
                                       rtol=2e-5, atol=1e-4)
            np.testing.assert_allclose(np.asarray(fused[3])[:, 28:35],
                                       grpred[:, 49:56], rtol=2e-5, atol=1e-4)


def test_schur_mv_matches_composition():
    """Fused CG matvec vs schur_fwd + Hpp^-1 + schur_bwd composition."""
    rng = np.random.default_rng(9)
    (camtab, intr, pts_rank, obs_cam, ranks, obs_uvT, obs_w,
     C, P) = _tiny_ba_tables(seed=11)
    o = obs_cam.shape[0]
    wT = jnp.asarray(rng.normal(size=(18, o)).astype(np.float32))
    vtab = jnp.asarray(rng.normal(size=(C, 6)).astype(np.float32))
    hinv = jnp.asarray(rng.normal(size=(P, 3, 3)).astype(np.float32) * 0.1)
    bc, y = ot.schur_mv_t(wT, obs_cam, ranks, vtab, hinv, P, interpret=True)
    y_ref = ot.schur_fwd_t(wT, obs_cam, ranks, vtab, P, interpret=True)
    z = jnp.einsum("pij,pj->pi", hinv, y_ref)
    bc_ref = ot.schur_bwd_t(wT, obs_cam, ranks, z, C, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(bc), np.asarray(bc_ref), rtol=1e-5,
                               atol=1e-4)
