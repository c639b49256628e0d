"""Ring all-pairs matching over view shards vs the local matcher."""

import numpy as np
import jax.numpy as jnp

from tpusfm.matching import match as match_mod
from tpusfm.parallel import mesh as mesh_mod, ring_match

rng = np.random.default_rng(7)


def test_ring_matches_equal_local():
    V, N, D = 16, 64, 128
    base = rng.normal(size=(V, N, D)).astype(np.float32) * 20
    # Plant shared structure: half of each view's features copy view 0's.
    base[:, : N // 2] = base[0, : N // 2] + rng.normal(
        size=(V, N // 2, D)
    ).astype(np.float32) * 0.2
    mask = np.ones((V, N), bool)
    mask[3, 50:] = False

    m = mesh_mod.make_mesh(8)
    idx, ok = ring_match.ring_match_all_pairs(
        m, jnp.asarray(base), jnp.asarray(mask)
    )
    idx = np.asarray(idx)
    ok = np.asarray(ok)
    assert idx.shape == (V, V, N)

    # Every ordered pair must agree exactly with the local matcher.
    for a, b in [(0, 1), (2, 9), (3, 12), (7, 15), (14, 2)]:
        i_ref, ok_ref = match_mod.match_descriptors(
            jnp.asarray(base[a]), jnp.asarray(base[b]),
            jnp.asarray(mask[a]), jnp.asarray(mask[b]), cross_check=False,
        )
        np.testing.assert_array_equal(ok[a, b], np.asarray(ok_ref))
        sel = np.asarray(ok_ref)
        np.testing.assert_array_equal(idx[a, b][sel], np.asarray(i_ref)[sel])

    pl, mi, mv = ring_match.pairs_from_ring_table(idx, ok, min_matches=5)
    assert len(pl) > 0 and (pl[:, 0] < pl[:, 1]).all()
