"""Pallas TPU kernel: fused descriptor-distance + running top-2.

The matching hot loop (SURVEY.md §3.2 'match', the reference's cascade
hashing / HNSW at sparseBuilder.cpp:909-963) reduces to: for every
descriptor in A, the two smallest squared-L2 distances to B and the argmin.
The XLA path (matching.match) materializes the full (Na, Nb) distance
matrix in HBM, then reduces it.  This kernel keeps everything in VMEM:
each A-tile streams over B-tiles, computes the -2*A@B^T contribution on the
MXU, and folds a running top-2 per row — the (Na, Nb) matrix never exists,
so HBM traffic drops from O(Na*Nb) to O((Na+Nb)*D).

Round-4 kernel structure (verdict item 7) and its measured outcome:

- phase 1 runs every distance tile back-to-back on the MXU into VMEM
  scratch; phase 2 does a carry-free TREE top-2 merge (log2(nt) pairwise
  elementwise combines) and ONE final lane reduction — no per-tile lane
  reductions (r03) and no loop-carried (TM, TN) accumulators (a first
  r4 attempt; both serialize against the MXU);
- the B mask is folded into the |b|^2 row (+inf where masked) — no mask
  op in the loop;
- measured in the 16-iteration in-situ harness (scripts/match_ab.py):
  8.1 TFLOP/s vs r03's 8.3, elementwise-fold 6.1, 256x256 tiles 7.4 —
  and plain XLA batched einsum at the same shapes reaches only 6.7,
  while a 4096^3 bf16 matmul measures 53 TFLOP/s on this chip (the
  practical peak; nominal 197 is not reachable even by pure XLA
  matmuls here).  Conclusion: the matcher's (1024, 128, 1024) shapes
  are fill/drain-bound on the MXU (K = D = 128), every fold structure
  lands within 6-8 TFLOP/s, and this kernel beats XLA's own matmul
  path by ~20% while never materializing the distance matrix in HBM —
  the r03 "serial fold" theory is refuted by measurement;
- `quantized=True` runs the matmul in bf16: SIFT descriptors are
  u8-quantized (integers 0..255, features/sift.py RootSIFT x512), which
  bf16 represents EXACTLY, and the f32 accumulator holds every partial
  |a-b|^2 < 2^24 exactly — so bf16 is bit-identical to f32 for the
  production descriptor grid at ~4x the MXU rate.  Arbitrary float
  descriptors (quantized=False) use the f32 MXU path.

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
TN = 128  # B tile (256x256 tiles measured SLOWER: 7.4 vs 8.1 TFLOP/s)


def _match_kernel(a_ref, b_ref, b2m_ref, d1_ref, d2_ref, i1_ref, dts_ref):
    """a_ref: (TM, D); b_ref: (Nb, D); b2m_ref: (1, Nb) = |b|^2 with +inf at
    masked rows; dts_ref: VMEM scratch (nt, TM, TN); outputs per A row:
    d1, d2 (squared L2 incl. |a|^2), i1.

    Two phases so the MXU never waits on the fold (the round-3 kernel's
    per-tile lane reductions — and a first round-4 attempt's loop-carried
    (TM, TN) top-2 accumulators — both serialized VPU work against the
    matmuls; 8.3 / 6.1 TFLOP/s respectively):
      1. all nt distance tiles back-to-back on the MXU into VMEM scratch
         (independent matmuls — Mosaic pipelines them);
      2. a carry-free TREE top-2 merge over the tiles (log2(nt) pairwise
         (m1, m2, idx) combines, pure elementwise VPU), then one final
         lane reduction over the TN columns."""
    nb = b_ref.shape[0]
    nt = nb // TN
    inf = jnp.float32(_INF)  # literal: pallas kernels cannot capture consts
    a = a_ref[:]
    af = a.astype(jnp.float32)
    a2 = jnp.sum(af * af, axis=1)  # (TM,) f32 (bf16 squares are not exact)

    def p1(tb, _):
        b = b_ref[pl.ds(tb * TN, TN), :]  # (TN, D)
        prod = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (TM, TN)
        dts_ref[tb] = b2m_ref[0, pl.ds(tb * TN, TN)][None, :] - 2.0 * prod
        return 0

    jax.lax.fori_loop(0, nt, p1, 0, unroll=True)

    # Phase 2: tree merge of (m1, m2, tile-idx) triples.
    def combine(x, y):
        xm1, xm2, xi = x
        ym1, ym2, yi = y
        m1 = jnp.minimum(xm1, ym1)
        m2 = jnp.minimum(jnp.maximum(xm1, ym1), jnp.minimum(xm2, ym2))
        ti = jnp.where(ym1 < xm1, yi, xi)
        return m1, m2, ti

    tiles = [(dts_ref[t], jnp.full((TM, TN), inf, jnp.float32),
              jnp.full((TM, TN), t, jnp.int32)) for t in range(nt)]
    while len(tiles) > 1:
        nxt = [combine(tiles[i], tiles[i + 1])
               for i in range(0, len(tiles) - 1, 2)]
        if len(tiles) % 2:
            nxt.append(tiles[-1])
        tiles = nxt
    m1, m2, ti = tiles[0]

    # Once-per-program lane reductions over the TN columns.
    best1 = jnp.min(m1, axis=1)
    c = jnp.argmin(m1, axis=1).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, m1.shape, 1)
    is_c = col == c[:, None]
    best2 = jnp.minimum(jnp.min(jnp.where(is_c, inf, m1), axis=1),
                        jnp.min(m2, axis=1))
    tsel = jnp.sum(jnp.where(is_c, ti, 0), axis=1)
    # Each program writes its row of the (num_tiles, TM) outputs.  (1-D
    # outputs hit an XLA/Mosaic layout mismatch, and (1, TM) blocks violate
    # the 8-sublane rule, so outputs are whole-array blocks + row writes.)
    row = pl.program_id(0)
    d1_ref[row, :] = best1 + a2
    d2_ref[row, :] = best2 + a2
    i1_ref[row, :] = tsel * TN + c


def _pad_to(x, n, axis, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@partial(jax.jit, static_argnames=("interpret", "quantized"))
def match_topk2(da, db, mask_b, interpret: bool = False,
                quantized: bool = False):
    """Fused top-2 matcher for one pair.  da (Na, D), db (Nb, D) float32,
    mask_b (Nb,).  Returns (d1, d2, i1) per A row (squared L2).  Invalid B
    columns are masked to +inf; rows of A are the caller's to mask.
    quantized=True: descriptors lie on an integer grid (|v| <= 255, e.g.
    u8-quantized SIFT) — run the matmul in bf16, bit-exact for that grid."""
    na, d_dim = da.shape
    nb = db.shape[0]
    na_p = pl.cdiv(na, TM) * TM
    nb_p = pl.cdiv(nb, TN) * TN
    cdt = jnp.bfloat16 if quantized else jnp.float32
    a = _pad_to(da.astype(cdt), na_p, 0)
    b = _pad_to(db.astype(cdt), nb_p, 0)
    bf = _pad_to(db.astype(jnp.float32), nb_p, 0)
    m = _pad_to(mask_b, nb_p, 0)
    b2m = jnp.where(m, jnp.sum(bf * bf, axis=1), INF).reshape(1, -1)

    d1, d2, i1 = pl.pallas_call(
        _match_kernel,
        grid=(na_p // TM,),
        in_specs=[
            pl.BlockSpec((TM, d_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_p, d_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
        scratch_shapes=[pltpu.VMEM((nb_p // TN, TM, TN), jnp.float32)],
        interpret=interpret,
    )(a, b, b2m)
    return d1.reshape(-1)[:na], d2.reshape(-1)[:na], i1.reshape(-1)[:na]


def match_descriptors_pallas(da, db, mask_a, mask_b, ratio: float = 0.8,
                             cross_check: bool = True, interpret: bool = False,
                             quantized: bool = False):
    """Drop-in for matching.match.match_descriptors (single pair) built on
    the fused kernel.  Cross-checking runs the kernel in the B->A direction
    too (still no materialized distance matrix)."""
    d1, d2, i1 = match_topk2(da, db, mask_b, interpret=interpret,
                             quantized=quantized)
    ok = mask_a & (d1 < (ratio * ratio) * d2) & (d1 < INF)
    if cross_check:
        _, _, j1 = match_topk2(db, da, mask_a, interpret=interpret,
                               quantized=quantized)
        mutual = j1[i1] == jnp.arange(da.shape[0], dtype=jnp.int32)
        ok = ok & mutual
    return i1, ok
