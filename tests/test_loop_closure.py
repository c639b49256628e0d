"""Loop-closure pair retrieval (round-4 verdict item 2).

The reference finds revisit matches through its exhaustive pair default and
scalable matcher methods (sparseBuilder.cpp:786, 909-944); tpusfm's
contiguous mode needs an explicit revisit pair source or long sequences are
pure odometry (measured: pod-rung ATE 6.2 over multiple orbit loops).
These tests pin the retrieval proposal mechanism; pod-scale quality is
measured by bench.py's pod rung on hardware.
"""

import numpy as np

from tpusfm.matching import pairs as pairs_mod
from tpusfm.pipeline.config import config_from_overrides
from tpusfm.pipeline.sparse import generate_pairs


def _synthetic_features(V=24, N=64, D=128, period=8, seed=0):
    """Per-view descriptor sets where view i and i+period share a cluster
    center — a stand-in for two visits of the same pose."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(period, D)).astype(np.float32)
    desc = np.zeros((V, N, D), np.float32)
    for v in range(V):
        c = centers[v % period]
        desc[v] = c + 0.05 * rng.normal(size=(N, D))
    mask = np.ones((V, N), bool)
    return jnp.asarray(desc), jnp.asarray(mask)


def test_retrieval_pairs_find_revisits():
    desc, mask = _synthetic_features()
    pl = pairs_mod.retrieval_pairs(desc, mask, exclude=4, top_k=2,
                                   min_sim=0.5)
    assert len(pl) > 0
    gaps = pl[:, 1] - pl[:, 0]
    # Every retrieved pair should be at a multiple of the revisit period.
    assert np.all(gaps % 8 == 0), gaps
    # And the direct revisit (gap exactly one period) dominates.
    assert (gaps == 8).sum() >= len(pl) // 2
    # i < j, deduplicated, outside the excluded band.
    assert np.all(pl[:, 0] < pl[:, 1])
    assert len(np.unique(pl, axis=0)) == len(pl)
    assert np.all(gaps > 4)


def test_retrieval_pairs_min_sim_gate():
    desc, mask = _synthetic_features()
    none = pairs_mod.retrieval_pairs(desc, mask, exclude=4, top_k=2,
                                     min_sim=1.01)
    assert len(none) == 0


def test_generate_pairs_loop_mode_unions_contiguous():
    import types

    desc, mask = _synthetic_features()
    feats = types.SimpleNamespace(desc=desc, mask=mask)
    cfg = config_from_overrides(**{
        "matching.pair_mode": "contiguous", "matching.contiguous_window": 2,
        "matching.loop_closure": True, "matching.loop_top_k": 2,
        "matching.loop_min_sim": 0.5})
    pl = generate_pairs(24, cfg, feats=feats)
    gaps = pl[:, 1] - pl[:, 0]
    # Contiguous pairs present...
    assert (gaps <= 2).sum() == 23 + 22
    # ...plus revisit pairs beyond the contiguous window.
    assert (gaps >= 8).sum() > 0
    assert len(np.unique(pl, axis=0)) == len(pl)


def test_generate_pairs_loop_off_unchanged():
    cfg = config_from_overrides(**{
        "matching.pair_mode": "contiguous", "matching.contiguous_window": 3})
    pl = generate_pairs(10, cfg)
    ref = pairs_mod.contiguous_pairs(10, 3)
    assert np.array_equal(pl, ref)
