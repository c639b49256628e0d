"""Preemptive matching prefilter (parity: the reference's preemptive
matching option, sparseBuilder.cpp:819-820, 965-981 — top-200-feature
prematch as the large-collection scale lever)."""

import numpy as np

from tpusfm.pipeline.config import config_from_overrides
from tpusfm.pipeline.sparse import (
    detect_features, generate_pairs, match_pairs, preemptive_filter_pairs,
)
from tpusfm.utils.synth_render import render_orbit_images

_BASE = {
    "sift.n_octaves": 3, "sift.max_features": 512,
    "sift.max_per_octave": 256, "matching.pair_chunk": 8,
}


def test_preemptive_keeps_strong_pairs_drops_weak():
    images, gt = render_orbit_images(n_views=8, img_h=240, img_w=320, arc_deg=200.0)
    cfg_full = config_from_overrides(**_BASE)
    cfg_pre = config_from_overrides(**{**_BASE, "matching.preemptive": True})
    feats = detect_features(images, cfg_full)
    pl = generate_pairs(8, cfg_full)

    mi0, mv0 = match_pairs(feats, pl, cfg_full)
    keep = preemptive_filter_pairs(feats, pl, cfg_pre)
    c0 = mv0.sum(1)

    # Every pair strong enough for the geometric filter (>= 50 putative
    # matches, the reference's min_matches prune) must survive.
    assert (keep | (c0 < 50)).all()
    # The wide-arc scene has genuinely unmatched pairs — some are dropped.
    assert (~keep).sum() > 0

    # Full matching with the prefilter produces identical rows for kept
    # pairs and all-invalid rows for skipped ones.
    mi1, mv1 = match_pairs(feats, pl, cfg_pre)
    np.testing.assert_array_equal(mv1[keep], mv0[keep])
    np.testing.assert_array_equal(mi1[keep], mi0[keep])
    assert not mv1[~keep].any()
