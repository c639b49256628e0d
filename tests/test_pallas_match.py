"""Pallas fused top-2 matcher vs the XLA reference path (interpret mode on
CPU; the compiled path is exercised by bench/TPU runs)."""

import numpy as np
import jax.numpy as jnp

from tpusfm.matching import match
from tpusfm.ops import pallas_match

rng = np.random.default_rng(5)


def planted_pair(na=300, nb=460, n_planted=300, noise=0.3):
    da = rng.normal(size=(na, 128)).astype(np.float32) * 20
    perm = rng.permutation(na)[:n_planted]
    db = np.concatenate([
        da[perm] + rng.normal(size=(n_planted, 128)).astype(np.float32) * noise,
        rng.normal(size=(nb - n_planted, 128)).astype(np.float32) * 20,
    ])
    return da, db


def test_pallas_matches_xla_exactly():
    da, db = planted_pair()
    ma = np.ones(300, bool)
    mb = np.ones(460, bool)
    mb[100:120] = False
    i_x, ok_x = match.match_descriptors(
        jnp.asarray(da), jnp.asarray(db), jnp.asarray(ma), jnp.asarray(mb)
    )
    i_p, ok_p = pallas_match.match_descriptors_pallas(
        jnp.asarray(da), jnp.asarray(db), jnp.asarray(ma), jnp.asarray(mb),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ok_x), np.asarray(ok_p))
    both = np.asarray(ok_x)
    np.testing.assert_array_equal(np.asarray(i_x)[both], np.asarray(i_p)[both])
    assert both.sum() > 200


def test_pallas_nonmultiple_shapes_and_masks():
    # Shapes not multiples of 128 exercise the padding path; fully masked B
    # must produce zero matches.
    da, db = planted_pair(na=130, nb=200, n_planted=130)
    ma = np.ones(130, bool)
    d1, d2, i1 = pallas_match.match_topk2(
        jnp.asarray(da), jnp.asarray(db), jnp.zeros(200, bool), interpret=True
    )
    assert np.all(np.asarray(d1) >= 1e38)
    _, ok = pallas_match.match_descriptors_pallas(
        jnp.asarray(da), jnp.asarray(db), jnp.asarray(ma), jnp.ones(200, bool),
        interpret=True,
    )
    assert np.asarray(ok).sum() > 100
