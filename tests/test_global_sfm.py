"""Global SfM engine: rotation/translation averaging on synthetic tracks."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusfm.core import lie
from tpusfm.sfm import global_sfm
from tpusfm.utils import metrics
from synth import orbit_scene
from test_incremental import scene_to_feature_tracks


def test_rotation_averaging_exact_with_noise():
    rng = np.random.default_rng(0)
    V = 15
    aa = rng.normal(scale=0.6, size=(V, 3)).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(aa)))
    R_gt = np.einsum("vij,kj->vik", R_gt, R_gt[0])  # gauge R_0 = I
    edges = [(i, j) for i in range(V) for j in range(i + 1, V) if (i + j) % 2 == 0 or j == i + 1]
    ei = jnp.asarray([e[0] for e in edges], dtype=jnp.int32)
    ej = jnp.asarray([e[1] for e in edges], dtype=jnp.int32)
    R_rel = np.einsum("eij,ekj->eik", R_gt[[e[1] for e in edges]], R_gt[[e[0] for e in edges]])
    # Perturb the relative measurements.
    noise = rng.normal(scale=0.01, size=(len(edges), 3)).astype(np.float32)
    R_rel = np.einsum("eij,ejk->eik", np.asarray(lie.so3_exp(jnp.asarray(noise))), R_rel)
    w = jnp.ones(len(edges))
    # Spanning-chain init only.
    R_init = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    for v in range(1, V):
        # chain edges (v-1, v) exist (j = i+1 included above)
        eidx = edges.index((v - 1, v))
        R_init[v] = R_rel[eidx] @ R_init[v - 1]
    R_out = np.asarray(global_sfm.rotation_averaging(
        ei, ej, jnp.asarray(R_rel.astype(np.float32)), w, jnp.asarray(R_init), V, 40
    ))
    errs = metrics.rotation_error_deg(R_out, R_gt)
    assert errs.max() < 1.5, f"max rotation error {errs.max():.2f} deg"


def test_translation_averaging_recovers_centers():
    rng = np.random.default_rng(1)
    V = 12
    C_gt = rng.normal(size=(V, 3)).astype(np.float32) * 3
    C_gt[0] = 0
    edges = [(i, j) for i in range(V) for j in range(i + 1, V)]
    ei = jnp.asarray([e[0] for e in edges], dtype=jnp.int32)
    ej = jnp.asarray([e[1] for e in edges], dtype=jnp.int32)
    d = C_gt[[e[1] for e in edges]] - C_gt[[e[0] for e in edges]]
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    anchor = 1
    C = np.asarray(global_sfm.translation_averaging(
        ei, ej, jnp.asarray(d), jnp.ones(len(edges)), jnp.asarray(anchor), V, 200
    ))
    # Compare up to global scale (anchor edge sets |C_1 - C_0| = 1).
    s = np.linalg.norm(C_gt[anchor]) / max(np.linalg.norm(C[anchor]), 1e-9)
    np.testing.assert_allclose(C * s, C_gt, atol=0.05)


def test_global_engine_end_to_end():
    s = orbit_scene(n_cams=12, n_points=300, noise_px=0.4, seed=9, arc_deg=140.0)
    kp, track_ids = scene_to_feature_tracks(s)
    n_tracks = int(track_ids.max()) + 1
    intr = np.tile(s["intr"], (len(s["R"]), 1))
    eng = global_sfm.GlobalEngine(kp, intr, track_ids, n_tracks)
    scene = eng.run(jax.random.PRNGKey(0))
    reg = np.asarray(scene.cam_mask)
    assert reg.sum() == 12
    centers = np.asarray(scene.camera_centers())[reg]
    ate = metrics.ate_rmse(centers, s["centers"][reg])
    assert ate < 0.02, f"global SfM ATE {ate:.4f}"
    assert int(np.asarray(scene.point_mask).sum()) > 150
