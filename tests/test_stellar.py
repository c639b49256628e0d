"""Stellar SfM engine: pod-scale consistency + scaled translation fusion
(parity: ESfMEngine::STELLAR, reference sparseBuilder.cpp:195-200,
1537-1560)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusfm.sfm import stellar
from tpusfm.sfm.stellar import edge_scale_solve, scaled_translation_solve
from tpusfm.utils import metrics
from synth import orbit_scene
from test_incremental import scene_to_feature_tracks


def test_edge_scale_solve_recovers_log_scales():
    rng = np.random.default_rng(0)
    E = 30
    s_true = rng.uniform(-1, 1, E)
    s_true -= s_true.mean()
    links = [(a, b) for a in range(E) for b in range(a + 1, E) if rng.random() < 0.3]
    la = np.asarray([l[0] for l in links], np.int32)
    lb = np.asarray([l[1] for l in links], np.int32)
    rhs = s_true[la] - s_true[lb] + rng.normal(size=len(links)) * 0.01
    w = rng.uniform(1, 50, len(links))
    out = np.asarray(edge_scale_solve(
        jnp.asarray(la), jnp.asarray(lb),
        jnp.asarray(rhs, jnp.float32), jnp.asarray(w, jnp.float32),
        n_edges=E, cg_iters=200,
    ))
    assert np.abs(out - s_true).max() < 0.05


def test_edge_scale_solve_unlinked_edges_pinned():
    # Edges outside every link must come back exactly 0 (scale 1), finite.
    la = jnp.asarray([0, 1], jnp.int32)
    lb = jnp.asarray([1, 2], jnp.int32)
    rhs = jnp.asarray([0.5, -0.2], jnp.float32)
    w = jnp.ones(2, jnp.float32)
    out = np.asarray(edge_scale_solve(la, lb, rhs, w, n_edges=6, cg_iters=50))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[3:], 0.0, atol=1e-6)


def test_scaled_translation_solve_exact():
    rng = np.random.default_rng(1)
    V = 10
    C_gt = rng.normal(size=(V, 3)).astype(np.float32) * 3
    C_gt[0] = 0
    edges = [(i, j) for i in range(V) for j in range(i + 1, V) if rng.random() < 0.6]
    ei = jnp.asarray([e[0] for e in edges], jnp.int32)
    ej = jnp.asarray([e[1] for e in edges], jnp.int32)
    tvec = C_gt[[e[1] for e in edges]] - C_gt[[e[0] for e in edges]]
    tvec = tvec + rng.normal(size=tvec.shape).astype(np.float32) * 0.01
    C = np.asarray(scaled_translation_solve(
        ei, ej, jnp.asarray(tvec), jnp.ones(len(edges)), n_views=V, cg_iters=300,
    ))
    assert np.abs(C - C_gt).max() < 0.05


def test_stellar_engine_end_to_end():
    s = orbit_scene(n_cams=12, n_points=300, noise_px=0.4, seed=9, arc_deg=140.0)
    kp, track_ids = scene_to_feature_tracks(s)
    n_tracks = int(track_ids.max()) + 1
    intr = np.tile(s["intr"], (len(s["R"]), 1))
    eng = stellar.StellarEngine(kp, intr, track_ids, n_tracks)
    scene = eng.run(jax.random.PRNGKey(0))
    reg = np.asarray(scene.cam_mask)
    assert reg.sum() == 12
    centers = np.asarray(scene.camera_centers())[reg]
    ate = metrics.ate_rmse(centers, s["centers"][reg])
    assert ate < 0.02, f"stellar SfM ATE {ate:.4f}"
    assert int(np.asarray(scene.point_mask).sum()) > 150


def test_stellar_via_pipeline_config():
    """engine_type='stellar' is reachable through the pipeline config
    (ESfMEngine enum parity)."""
    from tpusfm.pipeline.config import config_from_overrides

    cfg = config_from_overrides(engine_type="stellar")
    assert cfg.engine_type == "stellar"
