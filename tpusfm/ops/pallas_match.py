"""Pallas TPU kernel: fused descriptor-distance + running top-2.

The matching hot loop (SURVEY.md §3.2 'match', the reference's cascade
hashing / HNSW at sparseBuilder.cpp:909-963) reduces to: for every
descriptor in A, the two smallest squared-L2 distances to B and the argmin.
The XLA path (matching.match) materializes the full (Na, Nb) distance
matrix in HBM, then reduces it.  This kernel keeps everything in VMEM:
each A-tile streams over B-tiles, computes the -2*A@B^T contribution on the
MXU, and folds a running (best1, best2, argbest) per row — the (Na, Nb)
matrix never exists, so HBM traffic drops from O(Na*Nb) to O((Na+Nb)*D).

Used by matching.match.match_descriptors on TPU backends; the XLA fallback
remains for CPU tests (and `interpret=True` covers the kernel in CI).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.4e38
INF = jnp.float32(_INF)
TM = 128  # A rows per program
TN = 128  # B tile


def _match_kernel(a_ref, b_ref, b2m_ref, d1_ref, d2_ref, i1_ref):
    """a_ref: (TM, D); b_ref: (Nb, D); b2m_ref: (2, Nb) rows = (|b|^2, mask);
    outputs per A row: d1, d2 (squared L2 incl. |a|^2), i1 (argmin)."""
    nb = b_ref.shape[0]
    inf = jnp.float32(_INF)  # literal: pallas kernels cannot capture consts
    a = a_ref[:]
    a2 = jnp.sum(a * a, axis=1)  # (TM,)

    def body(tb, carry):
        best1, best2, bidx = carry
        b = b_ref[pl.ds(tb * TN, TN), :]  # (TN, D)
        prod = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (TM, TN)
        b2 = b2m_ref[0, pl.ds(tb * TN, TN)]
        msk = b2m_ref[1, pl.ds(tb * TN, TN)]
        d = b2[None, :] - 2.0 * prod
        d = jnp.where(msk[None, :] > 0.5, d, inf)
        t1 = jnp.min(d, axis=1)
        targ = jnp.argmin(d, axis=1).astype(jnp.int32)
        ti = targ + tb * TN
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        d_wo = jnp.where(col == targ[:, None], inf, d)
        t2 = jnp.min(d_wo, axis=1)
        new1 = jnp.minimum(best1, t1)
        nidx = jnp.where(t1 < best1, ti, bidx)
        new2 = jnp.minimum(jnp.minimum(best2, t2), jnp.maximum(best1, t1))
        return new1, new2, nidx

    init = (
        jnp.full((TM,), inf, jnp.float32),
        jnp.full((TM,), inf, jnp.float32),
        jnp.zeros((TM,), jnp.int32),
    )
    best1, best2, bidx = jax.lax.fori_loop(0, nb // TN, body, init)
    # Each program writes its row of the (num_tiles, TM) outputs.  (1-D
    # outputs hit an XLA/Mosaic layout mismatch, and (1, TM) blocks violate
    # the 8-sublane rule, so outputs are whole-array blocks + row writes.)
    row = pl.program_id(0)
    d1_ref[row, :] = best1 + a2
    d2_ref[row, :] = best2 + a2
    i1_ref[row, :] = bidx


def _pad_to(x, n, axis, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@partial(jax.jit, static_argnames=("interpret",))
def match_topk2(da, db, mask_b, interpret: bool = False):
    """Fused top-2 matcher for one pair.  da (Na, D), db (Nb, D) float32,
    mask_b (Nb,).  Returns (d1, d2, i1) per A row (squared L2).  Invalid B
    columns are masked to +inf; rows of A are the caller's to mask."""
    na, d_dim = da.shape
    nb = db.shape[0]
    na_p = pl.cdiv(na, TM) * TM
    nb_p = pl.cdiv(nb, TN) * TN
    a = _pad_to(da.astype(jnp.float32), na_p, 0)
    b = _pad_to(db.astype(jnp.float32), nb_p, 0)
    m = _pad_to(mask_b.astype(jnp.float32), nb_p, 0)
    b2m = jnp.stack([jnp.sum(b * b, axis=1), m], axis=0)  # (2, Nb_p)

    d1, d2, i1 = pl.pallas_call(
        _match_kernel,
        grid=(na_p // TM,),
        in_specs=[
            pl.BlockSpec((TM, d_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_p, d_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, nb_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((na_p // TM, TM), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((na_p // TM, TM), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((na_p // TM, TM), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((na_p // TM, TM), jnp.float32),
            jax.ShapeDtypeStruct((na_p // TM, TM), jnp.float32),
            jax.ShapeDtypeStruct((na_p // TM, TM), jnp.int32),
        ),
        interpret=interpret,
    )(a, b, b2m)
    return d1.reshape(-1)[:na], d2.reshape(-1)[:na], i1.reshape(-1)[:na]


def match_descriptors_pallas(da, db, mask_a, mask_b, ratio: float = 0.8,
                             cross_check: bool = True, interpret: bool = False):
    """Drop-in for matching.match.match_descriptors (single pair) built on
    the fused kernel.  Cross-checking runs the kernel in the B->A direction
    too (still no materialized distance matrix)."""
    d1, d2, i1 = match_topk2(da, db, mask_b, interpret=interpret)
    ok = mask_a & (d1 < (ratio * ratio) * d2) & (d1 < INF)
    if cross_check:
        _, _, j1 = match_topk2(db, da, mask_a, interpret=interpret)
        mutual = j1[i1] == jnp.arange(da.shape[0], dtype=jnp.int32)
        ok = ok & mutual
    return i1, ok
