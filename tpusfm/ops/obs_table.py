"""Pallas TPU primitives for observation-table reductions.

Bundle adjustment's hot loop is entirely segment-sums and gathers over the
observation table (one row per 2D measurement): assembling the normal
equations, the Schur matvec inside CG, and the block-Jacobi preconditioner
(ba/bundle_adjust.py).  On TPU, XLA lowers `segment_sum` / fancy indexing to
per-row scatter/gather ops whose cost is ~flat per ROW regardless of row
width (measured ~12-25 ms per scatter and ~5 ms per gather at 1.5M rows on
v5e — >100x off HBM speed-of-light for the actual bytes moved).

These kernels replace every per-row op with block one-hot matmuls on the MXU:

- camera-side (few hundred segments): the one-hot lives in VMEM, the
  accumulator is a single revisited output block — `segsum_table`,
  `gather_table`.
- point-side (tens of thousands of segments): requires ids to be SORTED and
  DENSE (rank-compacted), so each 512-row block of observations touches a
  point window of < 2 blocks; the window base comes from scalar-prefetched
  per-block starts — `segsum_sorted`, `gather_sorted`.  `segsum_sorted`
  emits per-(block, window-half) partials (each output block written by
  exactly one grid step — no read-modify-write hazards) and reduces the
  ~2*O/B partial blocks with one tiny XLA segment-sum.

One-hot f32 matmuls are exact: 1.0 splits losslessly into the MXU's bf16
passes, so sums match `jax.ops.segment_sum` up to addition order.

The reference counterpart is Ceres' sparse CRS assembly walked on CPU
(src/adjuster/BundleAdjuster.h:100-141); there is no sparse matrix here at
all — the observation table IS the matrix.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 512   # window granularity: sorted ids in any B-row span cover < B
          # distinct values (rank-compaction invariant)
KSUB = 4  # sub-blocks processed per grid step (grid-step overhead, ~2.5us
          # each, dominates at B=512 — measured 20ms for 2930x2 steps;
          # KSUB=8 with a 512-wide table blows the 16MB VMEM scope)
BCAM = B * KSUB  # camera-side kernels have no window constraint: big blocks


def _oh_dot(onehot: jnp.ndarray, vals: jnp.ndarray, contract_lhs: int):
    """Exact-f32 one-hot contraction at bf16 MXU rate.

    A 0/1 matrix is exactly representable in bf16, so only `vals` needs
    precision care: split it into three bf16 terms (hi/mid/lo ~ 8 mantissa
    bits each ≈ f32's 24) and run three full-rate bf16 matmuls — cheaper
    than one f32 Precision.HIGHEST dot (6 passes) and exact to f32
    round-off, which segment sums must be (BA Hessian blocks)."""
    oh = onehot if onehot.dtype == jnp.bfloat16 else onehot.astype(jnp.bfloat16)
    hi = vals.astype(jnp.bfloat16)
    rem = vals - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((contract_lhs,), (0,)), ((), ()))

    def d(v):
        return jax.lax.dot_general(oh, v, dn,
                                   preferred_element_type=jnp.float32)

    return d(hi) + d(mid) + d(lo)


def _pad_rows(x, m, value=0):
    pad = m - x.shape[0]
    if pad <= 0:
        return x
    w = [(0, 0)] * x.ndim
    w[0] = (0, pad)
    return jnp.pad(x, w, constant_values=value)


def _ceil_to(n, m):
    return (n + m - 1) // m * m


# ---------------------------------------------------------------------------
# Camera-side (small table, any index order)
# ---------------------------------------------------------------------------

def _gather_table_kernel(idx_ref, tab_ref, out_ref):
    """out (B, D) = onehot(B, N) @ table (N, D); idx block (B, 1)."""
    n = tab_ref.shape[0]
    idx = idx_ref[:]  # (B, 1) int32
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n), 1)
    onehot = (cols == idx).astype(jnp.bfloat16)
    out_ref[:] = _oh_dot(onehot, tab_ref[:], contract_lhs=1)


@partial(jax.jit, static_argnames=("interpret",))
def gather_table(table: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False):
    """table (N, D) f32, idx (O,) int32 in [0, N) (or >= N for a zero row).
    Returns (O, D) = table[idx] with out-of-range ids yielding zeros."""
    o = idx.shape[0]
    n, d = table.shape
    o_p = _ceil_to(max(o, 1), BCAM)
    n_p = _ceil_to(max(n, 1), 8)
    idx_p = _pad_rows(idx.astype(jnp.int32).reshape(-1, 1), o_p, value=n_p)
    tab_p = _pad_rows(table.astype(jnp.float32), n_p)
    out = pl.pallas_call(
        _gather_table_kernel,
        grid=(o_p // BCAM,),
        in_specs=[
            pl.BlockSpec((BCAM, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, d), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BCAM, d), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((o_p, d), jnp.float32),
        interpret=interpret,
    )(idx_p, tab_p)
    return out[:o]


def _segsum_table_kernel(idx_ref, vals_ref, out_ref):
    """out (N, D) += onehot(B, N)^T @ vals (B, D) — the one-hot keeps obs on
    the sublane axis (idx blocks are (B, 1) columns, the only layout the
    TPU tiling rules allow) and the matmul contracts over it."""
    n = out_ref.shape[0]
    idx = idx_ref[:]  # (B, 1) int32
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n), 1)
    onehot = (cols == idx).astype(jnp.bfloat16)
    contrib = _oh_dot(onehot, vals_ref[:], contract_lhs=0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += contrib


@partial(jax.jit, static_argnames=("n", "interpret"))
def segsum_table(vals: jnp.ndarray, idx: jnp.ndarray, n: int,
                 interpret: bool = False):
    """vals (O, D) f32, idx (O,) int32 (any order; ids >= n are dropped).
    Returns (n, D) per-segment sums — `jax.ops.segment_sum` on the MXU."""
    o, d = vals.shape
    o_p = _ceil_to(max(o, 1), BCAM)
    n_p = _ceil_to(max(n, 1), 8)
    idx_p = _pad_rows(idx.astype(jnp.int32).reshape(-1, 1), o_p, value=n_p)
    vals_p = _pad_rows(vals.astype(jnp.float32), o_p)
    out = pl.pallas_call(
        _segsum_table_kernel,
        grid=(o_p // BCAM,),
        in_specs=[
            pl.BlockSpec((BCAM, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BCAM, d), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_p, d), lambda b: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, d), jnp.float32),
        interpret=interpret,
    )(idx_p, vals_p)
    return out[:n]


# ---------------------------------------------------------------------------
# Point-side (large table, sorted dense rank ids, windowed)
# ---------------------------------------------------------------------------

def _gather_sorted_kernel(wstart_ref, idx_ref, tab_ref, out_ref):
    """out (B, D) over j in {0,1}: += onehot(B, B) @ table_block(wstart+j)."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    base = (wstart_ref[b] + j) * B
    idx = idx_ref[:]  # (B, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], B), 1)
    onehot = (cols == (idx - base)).astype(jnp.bfloat16)
    contrib = _oh_dot(onehot, tab_ref[:], contract_lhs=1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += contrib


@partial(jax.jit, static_argnames=("interpret",))
def gather_sorted(table: jnp.ndarray, idx_sorted: jnp.ndarray,
                  interpret: bool = False):
    """table (P, D) f32; idx_sorted (O,) int32 NONDECREASING with dense
    values (every block of B rows spans < B distinct ids — rank-compacted).
    Returns (O, D) = table[idx_sorted]; ids >= P yield zeros."""
    o = idx_sorted.shape[0]
    p, d = table.shape
    o_p = _ceil_to(max(o, 1), B)
    p_tab = _ceil_to(max(p, 1), B) + B  # +1 window block for the last start
    idx_p = _pad_rows(idx_sorted.astype(jnp.int32).reshape(-1, 1), o_p,
                      value=p_tab - B)
    tab_p = _pad_rows(table.astype(jnp.float32), p_tab)
    wstart = jnp.minimum(idx_p[::B, 0] // B, p_tab // B - 2).astype(jnp.int32)
    out = pl.pallas_call(
        _gather_sorted_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(o_p // B, 2),
            in_specs=[
                pl.BlockSpec((B, 1), lambda b, j, ws: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, d), lambda b, j, ws: (ws[b] + j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, d), lambda b, j, ws: (b, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((o_p, d), jnp.float32),
        interpret=interpret,
    )(wstart, idx_p, tab_p)
    return out[:o]


def _segsum_sorted_kernel(wstart_ref, idx_ref, vals_ref, out_ref):
    """Partials for KSUB sub-blocks at once (one grid step amortizes the
    per-step dispatch/DMA overhead): sub-block k's half-j partial is
    onehot(B_obs, B_out)^T @ vals_k, written to its own output rows — each
    (s, j, k) output slice has exactly one writer."""
    s = pl.program_id(0)
    j = pl.program_id(1)
    idx = idx_ref[:]  # (KSUB*B, 1)
    vals = vals_ref[:]

    for k in range(KSUB):
        base = (wstart_ref[s * KSUB + k] + j) * B
        idx_k = idx[k * B:(k + 1) * B]
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
        onehot = (cols == (idx_k - base)).astype(jnp.bfloat16)
        out_ref[k * B:(k + 1) * B, :] = _oh_dot(
            onehot, vals[k * B:(k + 1) * B], contract_lhs=0
        )


@partial(jax.jit, static_argnames=("p", "interpret"))
def segsum_sorted(vals: jnp.ndarray, idx_sorted: jnp.ndarray, p: int,
                  interpret: bool = False):
    """vals (O, D) f32; idx_sorted as in `gather_sorted`.  Returns (p, D)
    per-segment sums.  Phase 1 (Pallas): per-(block, window-half) partials;
    phase 2 (XLA): segment-sum of the 2*O/B partial BLOCKS (tiny)."""
    o, d = vals.shape
    o_p = _ceil_to(max(o, 1), B * KSUB)
    p_tab = _ceil_to(max(p, 1), B) + B
    nb = o_p // B          # sub-blocks (window granularity)
    ns = nb // KSUB        # grid steps per half
    idx_p = _pad_rows(idx_sorted.astype(jnp.int32).reshape(-1, 1), o_p,
                      value=p_tab - B)
    vals_p = _pad_rows(vals.astype(jnp.float32), o_p)
    wstart = jnp.minimum(idx_p[::B, 0] // B, p_tab // B - 2).astype(jnp.int32)
    partials = pl.pallas_call(
        _segsum_sorted_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ns, 2),
            in_specs=[
                pl.BlockSpec((B * KSUB, 1), lambda s, j, ws: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B * KSUB, d), lambda s, j, ws: (s, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B * KSUB, d),
                                   lambda s, j, ws: (s * 2 + j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nb * 2 * B, d), jnp.float32),
        interpret=interpret,
    )(wstart, idx_p, vals_p)
    # Phase 2: fold the 2*nb partial sub-blocks by their window-block id.
    # Partial row layout: (s, j, k) -> rows [((s*2+j)*KSUB + k) * B, +B).
    ids = jnp.stack([wstart.reshape(ns, KSUB), wstart.reshape(ns, KSUB) + 1],
                    axis=1).reshape(-1)  # (ns*2*KSUB,) in (s, j, k) order
    flat = partials.reshape(nb * 2, B * d)
    folded = jax.ops.segment_sum(flat, ids, num_segments=p_tab // B)
    return folded.reshape(p_tab, d)[:p]


# ---------------------------------------------------------------------------
# Rank compaction helper (XLA; used by the BA pallas path)
# ---------------------------------------------------------------------------

def sort_and_rank(seg_ids: jnp.ndarray, valid: jnp.ndarray, n_segments: int):
    """Sort rows by segment id (invalid rows last) and rank-compact the ids
    so sorted ids are DENSE (consecutive distinct values differ by 1 — the
    precondition of the windowed kernels).

    Returns (order, ranks, rank_to_seg, rank_valid):
    - order (O,): permutation sorting the table
    - ranks (O,): dense rank id per sorted row; invalid rows get rank
      >= n_segments (dropped by the kernels)
    - rank_to_seg (n_segments,): original segment id per rank (junk where
      !rank_valid)
    - rank_valid (n_segments,): which rank slots are real
    """
    o = seg_ids.shape[0]
    key = jnp.where(valid, seg_ids.astype(jnp.int32), jnp.int32(2**30))
    order = jnp.argsort(key)
    key_s = key[order]
    newflag = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (key_s[1:] != key_s[:-1]).astype(jnp.int32),
    ])
    ranks = jnp.cumsum(newflag) - 1
    valid_s = valid[order]
    ranks = jnp.where(valid_s, ranks, jnp.int32(2**30))
    drop = n_segments  # scatter-with-drop slot
    ranks_c = jnp.minimum(ranks, drop)
    rank_to_seg = jnp.zeros((n_segments + 1,), jnp.int32).at[ranks_c].set(
        seg_ids[order].astype(jnp.int32), mode="drop"
    )[:n_segments]
    rank_valid = jnp.zeros((n_segments + 1,), bool).at[ranks_c].set(
        valid_s, mode="drop"
    )[:n_segments]
    return order, ranks, rank_to_seg, rank_valid
