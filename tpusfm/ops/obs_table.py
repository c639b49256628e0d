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

import os as _os_b

B = int(_os_b.environ.get("TPUSFM_B", 256))
          # window granularity: sorted ids in any B-row span cover < B
          # distinct values (rank-compaction invariant).  Round 4:
          # 512 -> 256 halves the windowed kernels' dominant VPU cost —
          # the (B, 2B) iota-compare one-hot builds total BL*2B ops per
          # grid step, LINEAR in B — while the (3, B)x(B, 2B) window
          # matmuls stay MXU-trivial.  Env-overridable for in-situ A/B.
KSUB = 8  # sub-blocks processed per grid step (grid-step overhead, ~2.5us
          # each, dominates at small blocks; 8 x 256 keeps the same
          # 2048-row span per step as the old 4 x 512)
BCAM = 2048  # camera-side kernels have no window constraint: big blocks


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
# Fused BA linearization kernel
# ---------------------------------------------------------------------------
#
# One pass over the observation table computes EVERYTHING the LM step needs
# from the current parameters: closed-form RADIAL3 reprojection Jacobians
# (pose 6, shared-intrinsics 7, point 3), Huber-weighted residuals, and all
# per-observation normal-equation products, emitted as fused value tables:
#
#   camvals (O, 43|85) = [Hcc 36 | gc 6 | Hcg 42 | robust cost 1]
#                                                   -> segsum_table by camera
#   ptvals  (O, 12)    = [Hpp 9 | gp 3]             -> segsum_sorted by rank
#   wc      (O, 18)    = Jc^T Jp row-major          -> Schur coupling table
#   grpvals (O, 56)    = [Hgg 49 | gg 7]            -> segsum_table by group
#   wg      (O, 21)    = Jg^T Jp row-major
#
# This replaces the XLA assembly pass (vmapped jacfwd + einsums), whose
# (O, 2, 6)-shaped intermediates pad to (8, 128) tiles — a 10-20x HBM blowup
# that dominated the measured LM fixed cost (PERF.md "next levers" #1).  All
# math here is (B, 1..7)-lane VPU ops; the only HBM traffic is the obs rows
# in and the fused value tables out.
#
# The pose Jacobian uses d(R(aa) X)/daa = -R [X]x Jr(aa) (right Jacobian;
# core/lie.py so3_right_jacobian), with R and Jr precomputed PER CAMERA on
# the host side and gathered in-kernel by one-hot matmul — the per-obs work
# is 9 scalar*vector products instead of a full Rodrigues differentiation.
#
# Reference counterpart: Ceres' autodiff ReprojectCost evaluation
# (src/adjuster/BundleAdjuster.h:40-68) walked per-residual on CPU.

LIN_CAM_DIM = 21   # per-camera row: [t (3) | R row-major (9) | Jr row-major (9)]


def _recip_f32(v):
    """Full-f32 reciprocal inside a pallas body.  Mosaic lowers f32 division
    to the VPU's ~12-bit reciprocal approximation; two Newton steps
    (quadratic convergence) restore full f32 accuracy — without this the
    projection x = Xc/z carries ~1e-4 relative error, which is 0.1 px at
    f=1000 and wrecks the Gauss-Newton step quality."""
    r = 1.0 / v
    r = r * (2.0 - v * r)
    return r * (2.0 - v * r)


def _sqrt_f32(v):
    """Full-f32 sqrt via rsqrt + one Newton step (same Mosaic caveat)."""
    r = jax.lax.rsqrt(jnp.maximum(v, 1e-30))
    r = r * (1.5 - 0.5 * v * r * r)
    return v * r


def _linearize_math(refine, huber_delta, refine_mask, eps, X, camg, intg,
                    uv, w_in):
    """Value-level core of the fused linearization: gathered inputs ->
    (camvals, ptvals, wc[, grpvals, wg]) value blocks (shared by the
    windowed and resident-table kernels)."""
    # --- projection (matches core/camera.py camera_to_pixel exactly) ---
    Rr0, Rr1, Rr2 = camg[:, 3:6], camg[:, 6:9], camg[:, 9:12]

    def dot3(p, q):
        return jnp.sum(p * q, axis=1, keepdims=True)

    Xc1 = dot3(Rr0, X) + camg[:, 0:1]
    Xc2 = dot3(Rr1, X) + camg[:, 1:2]
    z = dot3(Rr2, X) + camg[:, 2:3]
    zs = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    iz = _recip_f32(zs)
    valid = w_in > 0
    # Gate masked/padded rows to a benign ray: their X gathers to 0, and if
    # the camera has |t_z| ~ 0 with nonzero k2/k3 the distortion polynomial
    # overflows to inf, whose 0-weight product is NaN — which would poison
    # the segment sums (advisor finding, round 2).
    x = jnp.where(valid, Xc1 * iz, 0.0)
    y = jnp.where(valid, Xc2 * iz, 0.0)
    r2 = x * x + y * y
    fx, fy = intg[:, 0:1], intg[:, 1:2]
    k1, k2, k3 = intg[:, 4:5], intg[:, 5:6], intg[:, 6:7]
    dist = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    de = k1 + r2 * (2.0 * k2 + 3.0 * k3 * r2)        # d dist / d r2
    ru = fx * x * dist + intg[:, 2:3] - uv[:, 0:1]
    rv = fy * y * dist + intg[:, 3:4] - uv[:, 1:2]

    # --- Huber IRLS weight ---
    nrm = _sqrt_f32(ru * ru + rv * rv)
    w = _sqrt_f32(jnp.minimum(
        1.0, huber_delta * _recip_f32(jnp.maximum(nrm, 1e-12))))
    w = w * w_in

    # --- residual Jacobians ---
    # d(u,v)/d(x,y) then chain through d(x,y)/dXc = [[iz,0,-x iz],[0,iz,-y iz]]
    au = fx * (dist + 2.0 * x * x * de)
    bu = 2.0 * fx * x * y * de
    cv = 2.0 * fy * x * y * de
    dv = fy * (dist + 2.0 * y * y * de)
    Lu = jnp.concatenate([au * iz, bu * iz, -(au * x + bu * y) * iz], axis=1)
    Lv = jnp.concatenate([cv * iz, dv * iz, -(cv * x + dv * y) * iz], axis=1)

    # columns of R (for A = R [X]x and Jp = L R)
    Rc0 = jnp.concatenate([camg[:, 3:4], camg[:, 6:7], camg[:, 9:10]], axis=1)
    Rc1 = jnp.concatenate([camg[:, 4:5], camg[:, 7:8], camg[:, 10:11]], axis=1)
    Rc2 = jnp.concatenate([camg[:, 5:6], camg[:, 8:9], camg[:, 11:12]], axis=1)
    X1, X2, X3 = X[:, 0:1], X[:, 1:2], X[:, 2:3]
    a1 = X3 * Rc1 - X2 * Rc2
    a2 = X1 * Rc2 - X3 * Rc0
    a3 = X2 * Rc0 - X1 * Rc1
    # N = dXc/daa = -(R [X]x) Jr; Jr row-major in camg lanes 12..20
    N0 = -(camg[:, 12:13] * a1 + camg[:, 15:16] * a2 + camg[:, 18:19] * a3)
    N1 = -(camg[:, 13:14] * a1 + camg[:, 16:17] * a2 + camg[:, 19:20] * a3)
    N2 = -(camg[:, 14:15] * a1 + camg[:, 17:18] * a2 + camg[:, 20:21] * a3)

    Jc_u = jnp.concatenate([dot3(Lu, N0), dot3(Lu, N1), dot3(Lu, N2), Lu], axis=1)
    Jc_v = jnp.concatenate([dot3(Lv, N0), dot3(Lv, N1), dot3(Lv, N2), Lv], axis=1)
    Jp_u = jnp.concatenate([dot3(Lu, Rc0), dot3(Lu, Rc1), dot3(Lu, Rc2)], axis=1)
    Jp_v = jnp.concatenate([dot3(Lv, Rc0), dot3(Lv, Rc1), dot3(Lv, Rc2)], axis=1)

    ru, rv = ru * w, rv * w
    Jc_u, Jc_v = Jc_u * w, Jc_v * w
    Jp_u, Jp_v = Jp_u * w, Jp_v * w
    if refine:
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        r4 = r2 * r2
        r6 = r4 * r2
        # refine_mask entries are STATIC 0/1 floats — fold them into each
        # column (a captured jnp constant is not allowed in a pallas body).
        m = [float(v) for v in refine_mask]
        Jg_u = jnp.concatenate(
            [x * dist * m[0], zero, one * m[2], zero,
             fx * x * r2 * m[4], fx * x * r4 * m[5], fx * x * r6 * m[6]],
            axis=1)
        Jg_v = jnp.concatenate(
            [zero, y * dist * m[1], zero, one * m[3],
             fy * y * r2 * m[4], fy * y * r4 * m[5], fy * y * r6 * m[6]],
            axis=1)
        Jg_u = Jg_u * w
        Jg_v = Jg_v * w

    # --- fused per-obs normal-equation products ---
    camvals = [Jc_u[:, i:i + 1] * Jc_u + Jc_v[:, i:i + 1] * Jc_v
               for i in range(6)]                                  # Hcc 36
    camvals.append(Jc_u * ru + Jc_v * rv)                          # gc 6
    if refine:
        camvals += [Jc_u[:, i:i + 1] * Jg_u + Jc_v[:, i:i + 1] * Jg_v
                    for i in range(6)]                             # Hcg 42
    # Per-obs robust (Huber) cost of the UNWEIGHTED residual — lets the LM
    # driver reuse this pass as the accept-test cost evaluation (two-pass
    # accept, PERF.md lever #2).  Masked rows contribute exact zeros.
    hcost = jnp.where(
        nrm <= huber_delta, 0.5 * nrm * nrm,
        huber_delta * (nrm - 0.5 * huber_delta))
    camvals.append(jnp.where(valid, hcost * w_in, 0.0))            # cost 1
    camvals_v = jnp.concatenate(camvals, axis=1)

    ptvals = [Jp_u[:, i:i + 1] * Jp_u + Jp_v[:, i:i + 1] * Jp_v
              for i in range(3)]                                   # Hpp 9
    ptvals.append(Jp_u * ru + Jp_v * rv)                           # gp 3
    ptvals_v = jnp.concatenate(ptvals, axis=1)

    wc_v = jnp.concatenate(
        [Jc_u[:, i:i + 1] * Jp_u + Jc_v[:, i:i + 1] * Jp_v for i in range(6)],
        axis=1)                                                    # W_c 18

    if refine:
        grpvals = [Jg_u[:, i:i + 1] * Jg_u + Jg_v[:, i:i + 1] * Jg_v
                   for i in range(7)]                              # Hgg 49
        grpvals.append(Jg_u * ru + Jg_v * rv)                      # gg 7
        grpvals_v = jnp.concatenate(grpvals, axis=1)
        wg_v = jnp.concatenate(
            [Jg_u[:, i:i + 1] * Jp_u + Jg_v[:, i:i + 1] * Jp_v
             for i in range(7)], axis=1)                           # W_g 21
        return camvals_v, ptvals_v, wc_v, grpvals_v, wg_v
    return camvals_v, ptvals_v, wc_v


def _linearize_kernel(refine, huber_delta, refine_mask, eps,
                      wstart_ref, ranks_ref, cam_ref, grp_ref, uv_ref, w_ref,
                      camtab_ref, grptab_ref, pts0_ref, pts1_ref,
                      *out_refs):
    if refine:
        camvals_ref, ptvals_ref, wc_ref, grpvals_ref, wg_ref = out_refs
    else:
        camvals_ref, ptvals_ref, wc_ref = out_refs
    b = pl.program_id(0)
    nB = ranks_ref.shape[0]
    Cp = camtab_ref.shape[0]
    Gp = grptab_ref.shape[0]

    # --- gathers (one-hot MXU matmuls; exact via the hi/mid/lo 3-split) ---
    rk = ranks_ref[:]                       # (B, 1) dense sorted point ranks
    base = wstart_ref[b] * nB
    loc = rk - base
    colsB = jax.lax.broadcasted_iota(jnp.int32, (nB, nB), 1)
    # pts1_ref is the SAME table shifted down by one block (built by the
    # wrapper), so both window halves index at ws[b] — passing one array
    # through two in_specs with different index maps is not supported.
    X = (_oh_dot((colsB == loc).astype(jnp.bfloat16), pts0_ref[:], 1)
         + _oh_dot((colsB == loc - nB).astype(jnp.bfloat16), pts1_ref[:], 1))
    colsC = jax.lax.broadcasted_iota(jnp.int32, (nB, Cp), 1)
    camg = _oh_dot((colsC == cam_ref[:]).astype(jnp.bfloat16), camtab_ref[:], 1)
    colsG = jax.lax.broadcasted_iota(jnp.int32, (nB, Gp), 1)
    intg = _oh_dot((colsG == grp_ref[:]).astype(jnp.bfloat16), grptab_ref[:], 1)

    outs = _linearize_math(refine, huber_delta, refine_mask, eps, X, camg,
                           intg, uv_ref[:], w_ref[:])
    camvals_ref[:] = outs[0]
    ptvals_ref[:] = outs[1]
    wc_ref[:] = outs[2].astype(wc_ref.dtype)
    if refine:
        grpvals_ref[:] = outs[3]
        wg_ref[:] = outs[4].astype(wg_ref.dtype)


def _linearize_big_kernel(refine, huber_delta, refine_mask, eps,
                          wstart_ref, ranks_ref, cam_ref, grp_ref, uv_ref,
                          w_ref, camtab_ref, grptab_ref, pts_ref, *out_refs):
    """Resident-table variant: the FULL rank-space point table lives in
    VMEM, KS_BIG sub-blocks per grid step (fori_loop; one sub-block's
    scratch at a time), windows as VMEM dynamic slices."""
    if refine:
        camvals_ref, ptvals_ref, wc_ref, grpvals_ref, wg_ref = out_refs
    else:
        camvals_ref, ptvals_ref, wc_ref = out_refs
    s = pl.program_id(0)
    Cp = camtab_ref.shape[0]
    Gp = grptab_ref.shape[0]

    def body(k, _):
        rk = ranks_ref[pl.ds(k * B, B), :]
        base = wstart_ref[s * KS_LIN + k] * B
        zwin = pts_ref[pl.ds(base, 2 * B), :]               # (2B, 3)
        colsB = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * B), 1)
        X = _oh_dot((colsB == (rk - base)).astype(jnp.bfloat16), zwin, 1)
        cam_k = cam_ref[pl.ds(k * B, B), :]
        colsC = jax.lax.broadcasted_iota(jnp.int32, (B, Cp), 1)
        camg = _oh_dot((colsC == cam_k).astype(jnp.bfloat16), camtab_ref[:], 1)
        grp_k = grp_ref[pl.ds(k * B, B), :]
        colsG = jax.lax.broadcasted_iota(jnp.int32, (B, Gp), 1)
        intg = _oh_dot((colsG == grp_k).astype(jnp.bfloat16), grptab_ref[:], 1)
        outs = _linearize_math(refine, huber_delta, refine_mask, eps, X,
                               camg, intg, uv_ref[pl.ds(k * B, B), :],
                               w_ref[pl.ds(k * B, B), :])
        camvals_ref[pl.ds(k * B, B), :] = outs[0]
        ptvals_ref[pl.ds(k * B, B), :] = outs[1]
        wc_ref[pl.ds(k * B, B), :] = outs[2].astype(wc_ref.dtype)
        if refine:
            grpvals_ref[pl.ds(k * B, B), :] = outs[3]
            wg_ref[pl.ds(k * B, B), :] = outs[4].astype(wg_ref.dtype)
        return 0

    jax.lax.fori_loop(0, KS_LIN, body, 0)


@partial(jax.jit, static_argnames=("refine", "refine_mask", "huber_delta",
                                   "interpret", "w_dtype"))
def linearize_radial3(camtab: jnp.ndarray, grptab: jnp.ndarray,
                      pts_rank: jnp.ndarray, obs_cam: jnp.ndarray,
                      obs_grp: jnp.ndarray, ranks: jnp.ndarray,
                      obs_uv: jnp.ndarray, obs_w: jnp.ndarray,
                      refine: bool, refine_mask: tuple, huber_delta: float,
                      interpret: bool = False, w_dtype: str = "f32"):
    """Fused BA linearization: one pallas pass over the (point-sorted)
    observation table -> (camvals, ptvals, wc[, grpvals, wg]).

    camtab (C, 21) f32 [t | R row-major | Jr row-major]; grptab (G, 7)
    [fx,fy,cx,cy,k1,k2,k3]; pts_rank (P, 3) point table in RANK space;
    ranks (O,) dense sorted point ranks (sort_and_rank); obs_w (O,) weights
    (0 = masked).  Huber weights are folded in; every output entry carries
    w^2, so masked/padded rows contribute exact zeros."""
    o = ranks.shape[0]
    c = camtab.shape[0]
    g = grptab.shape[0]
    p = pts_rank.shape[0]
    c_p = _ceil_to(max(c, 1), 8)
    g_p = _ceil_to(max(g, 1), 8)
    p_tab = _ceil_to(max(p, 1), B) + B
    big = p_tab <= MAX_RESIDENT_ROWS
    o_p = _ceil_to(max(o, 1), B * KS_LIN if big else B)
    nb = o_p // B
    ranks_p = _pad_rows(ranks.astype(jnp.int32).reshape(-1, 1), o_p,
                        value=p_tab - B)
    cam_p = _pad_rows(obs_cam.astype(jnp.int32).reshape(-1, 1), o_p, value=c_p)
    grp_p = _pad_rows(obs_grp.astype(jnp.int32).reshape(-1, 1), o_p, value=g_p)
    uv_p = _pad_rows(obs_uv.astype(jnp.float32), o_p)
    w_p = _pad_rows(obs_w.astype(jnp.float32).reshape(-1, 1), o_p)
    camtab_p = _pad_rows(camtab.astype(jnp.float32), c_p)
    grptab_p = _pad_rows(grptab.astype(jnp.float32), g_p)
    pts_p = _pad_rows(pts_rank.astype(jnp.float32), p_tab)
    wstart = jnp.minimum(ranks_p[::B, 0] // B, p_tab // B - 2).astype(jnp.int32)

    cam_w = 85 if refine else 43  # [Hcc 36 | gc 6 | (Hcg 42) | cost 1]
    wdt = jnp.bfloat16 if w_dtype == "bf16" else jnp.float32
    if big:
        KB = B * KS_LIN
        obs_widths = [cam_w, 12, 18] + ([56, 21] if refine else [])
        obs_dts = [jnp.float32, jnp.float32, wdt] + (
            [jnp.float32, wdt] if refine else [])
        outs = pl.pallas_call(
            partial(_linearize_big_kernel, refine, float(huber_delta),
                    tuple(refine_mask), 1e-8),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(o_p // KB,),
                in_specs=[
                    pl.BlockSpec((KB, 1), lambda s, ws: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((KB, 1), lambda s, ws: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((KB, 1), lambda s, ws: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((KB, 2), lambda s, ws: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((KB, 1), lambda s, ws: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((c_p, LIN_CAM_DIM), lambda s, ws: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((g_p, 7), lambda s, ws: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((p_tab, 3), lambda s, ws: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((KB, wd), lambda s, ws: (s, 0),
                                 memory_space=pltpu.VMEM)
                    for wd in obs_widths
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct((o_p, wd), dt)
                       for wd, dt in zip(obs_widths, obs_dts)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(wstart, ranks_p, cam_p, grp_p, uv_p, w_p, camtab_p, grptab_p,
          pts_p)
        return tuple(out[:o] for out in outs)
    out_shapes = [
        jax.ShapeDtypeStruct((o_p, cam_w), jnp.float32),   # camvals
        jax.ShapeDtypeStruct((o_p, 12), jnp.float32),      # ptvals
        jax.ShapeDtypeStruct((o_p, 18), wdt),              # wc
    ]
    out_specs = [
        pl.BlockSpec((B, cam_w), lambda b, ws: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 12), lambda b, ws: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 18), lambda b, ws: (b, 0), memory_space=pltpu.VMEM),
    ]
    if refine:
        out_shapes += [
            jax.ShapeDtypeStruct((o_p, 56), jnp.float32),  # grpvals
            jax.ShapeDtypeStruct((o_p, 21), wdt),          # wg
        ]
        out_specs += [
            pl.BlockSpec((B, 56), lambda b, ws: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 21), lambda b, ws: (b, 0), memory_space=pltpu.VMEM),
        ]
    outs = pl.pallas_call(
        partial(_linearize_kernel, refine, float(huber_delta),
                tuple(refine_mask), 1e-8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((B, 1), lambda b, ws: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda b, ws: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda b, ws: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 2), lambda b, ws: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda b, ws: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c_p, LIN_CAM_DIM), lambda b, ws: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_p, 7), lambda b, ws: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 3), lambda b, ws: (ws[b], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 3), lambda b, ws: (ws[b], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(wstart, ranks_p, cam_p, grp_p, uv_p, w_p, camtab_p, grptab_p,
      pts_p, jnp.concatenate([pts_p[B:], jnp.zeros((B, 3), jnp.float32)]))
    return tuple(out[:o] for out in outs)


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


# ---------------------------------------------------------------------------
# Fused Schur-matvec kernels
# ---------------------------------------------------------------------------
#
# The Schur matvec S @ v = Hcc_d v - W Hpp^-1 W^T v runs inside every PCG
# iteration; composed from the generic primitives above it takes ~6 HBM
# passes over the (O, D*3) coupling table (gather vc, einsum, point segsum,
# gather z, einsum, cam segsum) at ~50 ms per matvec for 1.5M observations
# on v5e — ~130x off the table's single-pass speed-of-light (~0.4 ms).
# These two kernels fuse each DIRECTION into ONE pass over W:
#
#   schur_fwd:  y_p = sum_{o in p} W_o^T v_{cam(o)}     (one W read)
#   schur_bwd:  b_c = sum_{o in c} W_o z_{pt(o)}        (one W read)
#
# The per-observation (D, 3) contraction is expressed as constant 0/1
# selection matmuls so everything stays on the MXU/VPU with exact-f32
# results (the 0/1 matrices are exact in bf16; float operands use the same
# hi/mid/lo 3-split as _oh_dot):
#
#   Wv_o = (repeat(vg_o) * W_o) @ Sel        repeat = vg @ Rep, Rep (D, 3D)
#   bk_o = (tile(zg_o) * W_o) @ RepT         tile = zg @ SelT,  Sel (3D, 3)
#
# with Rep[d, e] = [e // 3 == d] and Sel[e, k] = [e % 3 == k].


def _split3(vals: jnp.ndarray):
    """hi/mid/lo bf16 split of f32 values (exact to f32 round-off)."""
    hi = vals.astype(jnp.bfloat16)
    rem = vals - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot_vals01(vals: jnp.ndarray, m01: jnp.ndarray):
    """Exact f32 vals (B, E) @ 0/1 matrix (E, F) at bf16 MXU rate."""
    hi, mid, lo = _split3(vals)
    m = m01.astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    def d(v):
        return jax.lax.dot_general(v, m, dn, preferred_element_type=jnp.float32)

    return d(hi) + d(mid) + d(lo)


def _rep_sel(d_block: int):
    """Constant selection matrices for the (D, 3) contraction layout.
    Rep (D, 3D): Rep[d, e] = [e // 3 == d];  Sel (3D, 3): Sel[e, k] = [e % 3 == k]."""
    e = jax.lax.broadcasted_iota(jnp.int32, (d_block, 3 * d_block), 1)
    drow = jax.lax.broadcasted_iota(jnp.int32, (d_block, 3 * d_block), 0)
    rep = (e // 3 == drow).astype(jnp.float32)
    e2 = jax.lax.broadcasted_iota(jnp.int32, (3 * d_block, 3), 0)
    k2 = jax.lax.broadcasted_iota(jnp.int32, (3 * d_block, 3), 1)
    sel = (e2 % 3 == k2).astype(jnp.float32)
    return rep, sel


KS_BIG = 8              # sub-blocks per grid step in the resident-table
                        # schur kernels (fewer, larger steps: the windowed
                        # kernels' per-step overhead dominated the CG matvec
                        # — measured ~39 ms/CG iter for ~0.25 ms of HBM
                        # traffic at the 500-cam config)
MAX_RESIDENT_ROWS = 300_000  # use the resident-table path while the full
                             # (p, 3) rank table fits comfortably in VMEM
KS_LIN = 4                   # sub-blocks per step in the resident-table
                             # linearize kernel (its per-block scratch is
                             # much larger than the schur kernels'; runs
                             # with a raised scoped-VMEM limit)


def _schur_fwd_big_kernel(wstart_ref, idx_ref, cam_ref, w_ref, vtab_ref,
                          out_ref):
    """Resident-table fused W^T v: the FULL (p_tab, 3) output accumulator
    lives in VMEM across all grid steps; each step processes KS_BIG
    sub-blocks, scattering each into its (2B)-row window by dynamic-slice
    accumulate — no per-window DMAs, no partial blocks, no phase-2."""
    s = pl.program_id(0)
    dblk = vtab_ref.shape[1]
    ncam = vtab_ref.shape[0]
    rep, sel = _rep_sel(dblk)

    @pl.when(s == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # fori_loop over the sub-blocks (not an unrolled Python loop — that
    # kept all 8 sub-blocks' scratch live and blew the 16 MB VMEM scope);
    # per-block inputs come from ref slices (value dynamic_slice is not
    # lowered in Pallas TC).
    def body(k, _):
        base = wstart_ref[s * KS_BIG + k] * B
        idx_k = idx_ref[pl.ds(k * B, B), :]
        cam_k = cam_ref[pl.ds(k * B, B), :]
        w_k = w_ref[pl.ds(k * B, B), :].astype(jnp.float32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, ncam), 1)
        onehot_c = (cols == cam_k).astype(jnp.bfloat16)
        vg = _oh_dot(onehot_c, vtab_ref[:], contract_lhs=1)  # (B, D)
        eg = _dot_vals01(vg, rep)                            # (B, 3D)
        wv = _dot_vals01(eg * w_k, sel)                      # (B, 3)
        cols2 = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * B), 1)
        onehot = (cols2 == (idx_k - base)).astype(jnp.bfloat16)
        out_ref[pl.ds(base, 2 * B), :] += _oh_dot(onehot, wv, contract_lhs=0)
        return 0

    jax.lax.fori_loop(0, KS_BIG, body, 0)


def _schur_bwd_big_kernel(wstart_ref, idx_ref, cam_ref, w_ref, ztab_ref,
                          out_ref):
    """Resident-table fused b_c += onehot_cam^T (W z): the FULL (p_tab, 3)
    z table lives in VMEM; per sub-block the (2B)-row window is a VMEM
    dynamic slice instead of a per-step DMA."""
    s = pl.program_id(0)
    dblk = out_ref.shape[1]
    ncam = out_ref.shape[0]
    rep, sel = _rep_sel(dblk)

    @pl.when(s == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # fori_loop over sub-blocks; ref slices for per-block inputs (see
    # _schur_fwd_big_kernel).
    def body(k, _):
        base = wstart_ref[s * KS_BIG + k] * B
        zwin = ztab_ref[pl.ds(base, 2 * B), :]              # (2B, 3)
        idx_k = idx_ref[pl.ds(k * B, B), :]
        cols2 = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * B), 1)
        onehot = (cols2 == (idx_k - base)).astype(jnp.bfloat16)
        zg = _oh_dot(onehot, zwin, contract_lhs=1)          # (B, 3)
        tile = _dot_vals01(zg, sel.T)                       # (B, 3D)
        w_k = w_ref[pl.ds(k * B, B), :].astype(jnp.float32)
        bk = _dot_vals01(tile * w_k, rep.T)                 # (B, D)
        cam_k = cam_ref[pl.ds(k * B, B), :]
        cols_c = jax.lax.broadcasted_iota(jnp.int32, (B, ncam), 1)
        onehot_c = (cols_c == cam_k).astype(jnp.bfloat16)
        out_ref[:] += _oh_dot(onehot_c, bk, contract_lhs=0)
        return 0

    jax.lax.fori_loop(0, KS_BIG, body, 0)


def _schur_fwd_kernel(wstart_ref, idx_ref, cam_ref, w_ref, vtab_ref, out_ref):
    """Per grid step (s, j): KSUB sub-blocks of fused W^T v partials."""
    j = pl.program_id(1)
    s = pl.program_id(0)
    dblk = vtab_ref.shape[1]
    ncam = vtab_ref.shape[0]
    rep, sel = _rep_sel(dblk)
    idx = idx_ref[:]
    cam = cam_ref[:]
    # W may be stored bf16 (BAConfig.w_dtype): halves the HBM traffic of
    # the per-matvec W pass; upcast to f32 in VMEM for the arithmetic.
    w = w_ref[:].astype(jnp.float32)

    # vg = onehot_cam @ vtab, computed for the whole KSUB*B block at once.
    cols = jax.lax.broadcasted_iota(jnp.int32, (cam.shape[0], ncam), 1)
    onehot_c = (cols == cam).astype(jnp.bfloat16)
    vg = _oh_dot(onehot_c, vtab_ref[:], contract_lhs=1)     # (KB, D)
    eg = _dot_vals01(vg, rep)                               # (KB, 3D)
    wv = _dot_vals01(eg * w, sel)                           # (KB, 3)

    for k in range(KSUB):
        base = (wstart_ref[s * KSUB + k] + j) * B
        idx_k = idx[k * B:(k + 1) * B]
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
        onehot = (cols == (idx_k - base)).astype(jnp.bfloat16)
        out_ref[k * B:(k + 1) * B, :] = _oh_dot(
            onehot, wv[k * B:(k + 1) * B], contract_lhs=0
        )


@partial(jax.jit, static_argnames=("p", "interpret"))
def schur_fwd(w_flat: jnp.ndarray, obs_cam: jnp.ndarray,
              idx_sorted: jnp.ndarray, vtab: jnp.ndarray, p: int,
              interpret: bool = False):
    """Fused y = segsum_by_point(W_o^T v_cam(o)): w_flat (O, D*3) f32
    point-sorted, obs_cam (O,) ids into vtab (C, D), idx_sorted (O,) dense
    sorted point ranks.  Returns (p, 3) per-rank sums in ONE pass over W."""
    o, dd3 = w_flat.shape
    dblk = dd3 // 3
    c, _ = vtab.shape
    p_tab = _ceil_to(max(p, 1), B) + B
    c_p = _ceil_to(max(c, 1), 8)
    if p_tab <= MAX_RESIDENT_ROWS:
        KB = B * KS_BIG
        o_p = _ceil_to(max(o, 1), KB)
        idx_p = _pad_rows(idx_sorted.astype(jnp.int32).reshape(-1, 1), o_p,
                          value=p_tab - B)
        cam_p = _pad_rows(obs_cam.astype(jnp.int32).reshape(-1, 1), o_p,
                          value=c_p)
        w_p = _pad_rows(w_flat, o_p)
        vtab_p = _pad_rows(vtab.astype(jnp.float32), c_p)
        wstart = jnp.minimum(idx_p[::B, 0] // B,
                             p_tab // B - 2).astype(jnp.int32)
        out = pl.pallas_call(
            _schur_fwd_big_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(o_p // KB,),
                in_specs=[
                    pl.BlockSpec((KB, 1), lambda s, ws: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((KB, 1), lambda s, ws: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((KB, dd3), lambda s, ws: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((c_p, dblk), lambda s, ws: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((p_tab, 3), lambda s, ws: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((p_tab, 3), jnp.float32),
            interpret=interpret,
        )(wstart, idx_p, cam_p, w_p, vtab_p)
        return out[:p]
    o_p = _ceil_to(max(o, 1), B * KSUB)
    nb = o_p // B
    ns = nb // KSUB
    idx_p = _pad_rows(idx_sorted.astype(jnp.int32).reshape(-1, 1), o_p,
                      value=p_tab - B)
    cam_p = _pad_rows(obs_cam.astype(jnp.int32).reshape(-1, 1), o_p, value=c_p)
    w_p = _pad_rows(w_flat, o_p)  # f32 or bf16 — upcast happens in-kernel
    vtab_p = _pad_rows(vtab.astype(jnp.float32), c_p)
    wstart = jnp.minimum(idx_p[::B, 0] // B, p_tab // B - 2).astype(jnp.int32)
    partials = pl.pallas_call(
        _schur_fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ns, 2),
            in_specs=[
                pl.BlockSpec((B * KSUB, 1), lambda s, j, ws: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B * KSUB, 1), lambda s, j, ws: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B * KSUB, dd3), lambda s, j, ws: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_p, dblk), lambda s, j, ws: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B * KSUB, 3),
                                   lambda s, j, ws: (s * 2 + j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nb * 2 * B, 3), jnp.float32),
        interpret=interpret,
    )(wstart, idx_p, cam_p, w_p, vtab_p)
    ids = jnp.stack([wstart.reshape(ns, KSUB), wstart.reshape(ns, KSUB) + 1],
                    axis=1).reshape(-1)
    flat = partials.reshape(nb * 2, B * 3)
    folded = jax.ops.segment_sum(flat, ids, num_segments=p_tab // B)
    return folded.reshape(p_tab, 3)[:p]


def _schur_bwd_kernel(wstart_ref, idx_ref, cam_ref, w_ref, ztab_ref, out_ref):
    """Per grid step (b, j): fused b_c += onehot_cam^T (W_o z_pt(o))_halfj."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    dblk = out_ref.shape[1]
    rep, sel = _rep_sel(dblk)
    base = (wstart_ref[b] + j) * B
    idx = idx_ref[:]
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], B), 1)
    onehot_w = (cols == (idx - base)).astype(jnp.bfloat16)
    zg = _oh_dot(onehot_w, ztab_ref[:], contract_lhs=1)     # (B, 3) half-j
    tile = _dot_vals01(zg, sel.T)                           # (B, 3D)
    bk = _dot_vals01(tile * w_ref[:].astype(jnp.float32), rep.T)  # (B, D)

    cam = cam_ref[:]
    ncam = out_ref.shape[0]
    cols_c = jax.lax.broadcasted_iota(jnp.int32, (cam.shape[0], ncam), 1)
    onehot_c = (cols_c == cam).astype(jnp.bfloat16)
    contrib = _oh_dot(onehot_c, bk, contract_lhs=0)

    @pl.when((b == 0) & (j == 0))
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += contrib


@partial(jax.jit, static_argnames=("n", "interpret"))
def schur_bwd(w_flat: jnp.ndarray, obs_cam: jnp.ndarray,
              idx_sorted: jnp.ndarray, ztab: jnp.ndarray, n: int,
              interpret: bool = False):
    """Fused b = segsum_by_cam(W_o z_pt(o)): w_flat (O, D*3) f32
    point-sorted, idx_sorted (O,) dense sorted point ranks into ztab (P, 3),
    obs_cam (O,) ids in [0, n).  Returns (n, D) in ONE pass over W."""
    o, dd3 = w_flat.shape
    dblk = dd3 // 3
    p_z = ztab.shape[0]
    p_tab = _ceil_to(max(p_z, 1), B) + B
    n_p = _ceil_to(max(n, 1), 8)
    if p_tab <= MAX_RESIDENT_ROWS:
        KB = B * KS_BIG
        o_p = _ceil_to(max(o, 1), KB)
        idx_p = _pad_rows(idx_sorted.astype(jnp.int32).reshape(-1, 1), o_p,
                          value=p_tab - B)
        cam_p = _pad_rows(obs_cam.astype(jnp.int32).reshape(-1, 1), o_p,
                          value=n_p)
        w_p = _pad_rows(w_flat, o_p)
        ztab_p = _pad_rows(ztab.astype(jnp.float32), p_tab)
        wstart = jnp.minimum(idx_p[::B, 0] // B,
                             p_tab // B - 2).astype(jnp.int32)
        out = pl.pallas_call(
            _schur_bwd_big_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(o_p // KB,),
                in_specs=[
                    pl.BlockSpec((KB, 1), lambda s, ws: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((KB, 1), lambda s, ws: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((KB, dd3), lambda s, ws: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((p_tab, 3), lambda s, ws: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((n_p, dblk), lambda s, ws: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((n_p, dblk), jnp.float32),
            interpret=interpret,
        )(wstart, idx_p, cam_p, w_p, ztab_p)
        return out[:n]
    o_p = _ceil_to(max(o, 1), B)
    idx_p = _pad_rows(idx_sorted.astype(jnp.int32).reshape(-1, 1), o_p,
                      value=p_tab - B)
    cam_p = _pad_rows(obs_cam.astype(jnp.int32).reshape(-1, 1), o_p, value=n_p)
    w_p = _pad_rows(w_flat, o_p)  # f32 or bf16 — upcast happens in-kernel
    ztab_p = _pad_rows(ztab.astype(jnp.float32), p_tab)
    wstart = jnp.minimum(idx_p[::B, 0] // B, p_tab // B - 2).astype(jnp.int32)
    out = pl.pallas_call(
        _schur_bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(o_p // B, 2),
            in_specs=[
                pl.BlockSpec((B, 1), lambda b, j, ws: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda b, j, ws: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, dd3), lambda b, j, ws: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 3), lambda b, j, ws: (ws[b] + j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_p, dblk), lambda b, j, ws: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_p, dblk), jnp.float32),
        interpret=interpret,
    )(wstart, idx_p, cam_p, w_p, ztab_p)
    return out[:n]


# ---------------------------------------------------------------------------
# T-layout kernels: per-obs arrays stored (k, O) with OBSERVATIONS ON LANES
# ---------------------------------------------------------------------------
#
# The original kernels keep observations on sublanes and per-obs scalars as
# (B, 1) columns; Mosaic executes every elementwise op on such a column at
# ~1/128 VPU lane utilization (measured in-loop: a 120-op chain over 377k
# obs costs 12.6 ms as columns vs 1.78 ms as (1, 8192) lane rows — 7.1x).
# The T-layout stores each per-obs quantity as a ROW over observation
# lanes, so the whole linearization math runs at dense VPU utilization and
# every gather/reduce matmul gets an MXU-friendly (small-M x large-N)
# shape:
#
#   gather:   camtab^T (21, C) @ onehot (C, BL)      -> (21, BL)
#   reduce:   vals^T (43, BL) @ onehot^T (BL, C)     -> (43, C)
#   window:   lane-dynamic slices at 512-aligned offsets
#
# Obs blocks are BL = 8192 lanes per grid step (16x fewer steps than the
# sublane kernels' 512-row blocks).

# Env-overridable for in-situ A/B (scripts/ba_kernel_ab.py): the window
# one-hot build cost scales with B, per-grid-step overhead with 1/BL_T.
import os as _os

BL_T = int(_os.environ.get("TPUSFM_BL_T", 8192))  # observations per grid step
NSUB_T = BL_T // B    # windows per step (rank-window granularity)

# Span-chunked window one-hots (round 5).  Ranks are DENSE (every rank in
# [0, p) holds >= 1 observation) and sorted, so within any 128-lane chunk
# the rank span is <= 127 and a 256-wide ALIGNED slice of the point window
# covers every index in the chunk.  The per-sub-block (2B, B) iota-compare
# one-hot therefore shrinks to a (256, 128) one per vreg-width chunk — 4x
# fewer VPU compare/convert elements — and every window gather/scatter
# matmul narrows to a 256-deep contraction.  Measured at the 1.48M-obs BA
# bench shape (scripts/take_gather_ab.py, 16-iter in-situ loops): scatter
# 4.45 -> 2.31 ms/pass, gather 1.88 -> 1.62.  (A take_along_axis gather —
# Mosaic lowers it along lanes, but only at exactly 128-lane table width —
# measured SLOWER than the one-hot matmul: 1.85-3.2 ms.)  Pad lanes carry
# a far-away rank, match no row of the 256-window, and so contribute /
# gather exact zeros, same as the legacy (2B, B) form.
SPAN_W = 256
_SPAN = _os.environ.get("TPUSFM_SPAN_OH", "1") == "1"


def _span_chunks(loc):
    """Per-128-lane-chunk (c, j0, onehot) for dense sorted loc (1, nB).

    j0 is the 128-aligned window chunk index such that every in-range
    index of the chunk lies in [j0*128, j0*128 + SPAN_W); onehot is the
    (SPAN_W, 128) bf16 selection matrix (all-zero columns for lanes whose
    index falls outside the span, e.g. padding)."""
    out = []
    for c in range(loc.shape[1] // 128):
        idx_c = loc[:, c * 128:(c + 1) * 128]
        j0 = jnp.minimum(jnp.min(idx_c) >> 7, (2 * B - SPAN_W) // 128)
        j0 = jnp.maximum(j0, 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (SPAN_W, 128), 0)
        onehot = (rows == (idx_c - j0 * 128)).astype(jnp.bfloat16)
        out.append((c, j0, onehot))
    return out


def _linearize_math_t(refine, huber_delta, refine_mask, eps, X, camg, intg,
                      uv, w_in, packed=False):
    """T-layout twin of _linearize_math: every per-obs quantity is a
    (1, BL) lane row; concatenations stack rows (axis 0).
    X (3, BL), camg (21, BL), intg (7, BL), uv (2, BL), w_in (1, BL).
    Returns (camvalsT (43|85, BL), ptvalsT (12, BL), wcT (18, BL)
    [, grpvalsT (56, BL), wgT (21, BL)])."""
    def row(a, i):
        return a[i:i + 1, :]

    def dot3(p, q):  # (3, BL) x (3, BL) -> (1, BL)
        return jnp.sum(p * q, axis=0, keepdims=True)

    Rr0 = camg[3:6, :]
    Rr1 = camg[6:9, :]
    Rr2 = camg[9:12, :]
    Xc1 = dot3(Rr0, X) + row(camg, 0)
    Xc2 = dot3(Rr1, X) + row(camg, 1)
    z = dot3(Rr2, X) + row(camg, 2)
    zs = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    iz = _recip_f32(zs)
    valid = w_in > 0
    x = jnp.where(valid, Xc1 * iz, 0.0)
    y = jnp.where(valid, Xc2 * iz, 0.0)
    r2 = x * x + y * y
    fx, fy = row(intg, 0), row(intg, 1)
    k1, k2, k3 = row(intg, 4), row(intg, 5), row(intg, 6)
    dist = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    de = k1 + r2 * (2.0 * k2 + 3.0 * k3 * r2)
    ru = fx * x * dist + row(intg, 2) - row(uv, 0)
    rv = fy * y * dist + row(intg, 3) - row(uv, 1)

    nrm = _sqrt_f32(ru * ru + rv * rv)
    w = _sqrt_f32(jnp.minimum(
        1.0, huber_delta * _recip_f32(jnp.maximum(nrm, 1e-12))))
    w = w * w_in

    au = fx * (dist + 2.0 * x * x * de)
    bu = 2.0 * fx * x * y * de
    cv = 2.0 * fy * x * y * de
    dv = fy * (dist + 2.0 * y * y * de)
    Lu = jnp.concatenate([au * iz, bu * iz, -(au * x + bu * y) * iz], axis=0)
    Lv = jnp.concatenate([cv * iz, dv * iz, -(cv * x + dv * y) * iz], axis=0)

    Rc0 = jnp.concatenate([camg[3:4], camg[6:7], camg[9:10]], axis=0)
    Rc1 = jnp.concatenate([camg[4:5], camg[7:8], camg[10:11]], axis=0)
    Rc2 = jnp.concatenate([camg[5:6], camg[8:9], camg[11:12]], axis=0)
    X1, X2, X3 = X[0:1, :], X[1:2, :], X[2:3, :]
    a1 = X3 * Rc1 - X2 * Rc2
    a2 = X1 * Rc2 - X3 * Rc0
    a3 = X2 * Rc0 - X1 * Rc1
    N0 = -(camg[12:13] * a1 + camg[15:16] * a2 + camg[18:19] * a3)
    N1 = -(camg[13:14] * a1 + camg[16:17] * a2 + camg[19:20] * a3)
    N2 = -(camg[14:15] * a1 + camg[17:18] * a2 + camg[20:21] * a3)

    Jc_u = jnp.concatenate([dot3(Lu, N0), dot3(Lu, N1), dot3(Lu, N2), Lu], axis=0)
    Jc_v = jnp.concatenate([dot3(Lv, N0), dot3(Lv, N1), dot3(Lv, N2), Lv], axis=0)
    Jp_u = jnp.concatenate([dot3(Lu, Rc0), dot3(Lu, Rc1), dot3(Lu, Rc2)], axis=0)
    Jp_v = jnp.concatenate([dot3(Lv, Rc0), dot3(Lv, Rc1), dot3(Lv, Rc2)], axis=0)

    ru, rv = ru * w, rv * w
    Jc_u, Jc_v = Jc_u * w, Jc_v * w
    Jp_u, Jp_v = Jp_u * w, Jp_v * w
    if refine:
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        r4 = r2 * r2
        r6 = r4 * r2
        m = [float(v) for v in refine_mask]
        Jg_u = jnp.concatenate(
            [x * dist * m[0], zero, one * m[2], zero,
             fx * x * r2 * m[4], fx * x * r4 * m[5], fx * x * r6 * m[6]],
            axis=0)
        Jg_v = jnp.concatenate(
            [zero, y * dist * m[1], zero, one * m[3],
             fy * y * r2 * m[4], fy * y * r4 * m[5], fy * y * r6 * m[6]],
            axis=0)
        Jg_u = Jg_u * w
        Jg_v = Jg_v * w

    if packed:
        # Symmetric packing: only the upper triangles of Hcc / Hpp / Hgg are
        # emitted ((i, j), j >= i, row-major) — 21 vs 36, 6 vs 9, 28 vs 49
        # rows.  Cuts both the VPU products and the reduce-matmul FLOPs by
        # the same ratio; the caller reconstructs full blocks with a cheap
        # C/P-row gather (_FULL66 / _FULL33 / _FULL77 below).
        camvals = [Jc_u[i:i + 1, :] * Jc_u[i:, :]
                   + Jc_v[i:i + 1, :] * Jc_v[i:, :]
                   for i in range(6)]                              # Hcc 21
    else:
        camvals = [Jc_u[i:i + 1, :] * Jc_u + Jc_v[i:i + 1, :] * Jc_v
                   for i in range(6)]                              # Hcc 36
    camvals.append(Jc_u * ru + Jc_v * rv)                          # gc 6
    if refine:
        camvals += [Jc_u[i:i + 1, :] * Jg_u + Jc_v[i:i + 1, :] * Jg_v
                    for i in range(6)]                             # Hcg 42
    hcost = jnp.where(
        nrm <= huber_delta, 0.5 * nrm * nrm,
        huber_delta * (nrm - 0.5 * huber_delta))
    camvals.append(jnp.where(valid, hcost * w_in, 0.0))            # cost 1
    camvals_v = jnp.concatenate(camvals, axis=0)

    if packed:
        ptvals = [Jp_u[i:i + 1, :] * Jp_u[i:, :]
                  + Jp_v[i:i + 1, :] * Jp_v[i:, :]
                  for i in range(3)]                               # Hpp 6
    else:
        ptvals = [Jp_u[i:i + 1, :] * Jp_u + Jp_v[i:i + 1, :] * Jp_v
                  for i in range(3)]                               # Hpp 9
    ptvals.append(Jp_u * ru + Jp_v * rv)                           # gp 3
    ptvals_v = jnp.concatenate(ptvals, axis=0)

    wc_v = jnp.concatenate(
        [Jc_u[i:i + 1, :] * Jp_u + Jc_v[i:i + 1, :] * Jp_v for i in range(6)],
        axis=0)                                                    # W_c 18

    if refine:
        if packed:
            grpvals = [Jg_u[i:i + 1, :] * Jg_u[i:, :]
                       + Jg_v[i:i + 1, :] * Jg_v[i:, :]
                       for i in range(7)]                          # Hgg 28
        else:
            grpvals = [Jg_u[i:i + 1, :] * Jg_u + Jg_v[i:i + 1, :] * Jg_v
                       for i in range(7)]                          # Hgg 49
        grpvals.append(Jg_u * ru + Jg_v * rv)                      # gg 7
        grpvals_v = jnp.concatenate(grpvals, axis=0)
        wg_v = jnp.concatenate(
            [Jg_u[i:i + 1, :] * Jp_u + Jg_v[i:i + 1, :] * Jp_v
             for i in range(7)], axis=0)                           # W_g 21
        return camvals_v, ptvals_v, wc_v, grpvals_v, wg_v
    return camvals_v, ptvals_v, wc_v


def _linearize_t_kernel(refine, huber_delta, refine_mask, eps,
                        wstart_ref, ranks_ref, cam_ref, grp_ref, uv_ref,
                        w_ref, camtabT_ref, grptabT_ref, ptsT_ref, *out_refs):
    if refine:
        camvals_ref, ptvals_ref, wc_ref, grpvals_ref, wg_ref = out_refs
    else:
        camvals_ref, ptvals_ref, wc_ref = out_refs
    s = pl.program_id(0)
    Cp = camtabT_ref.shape[1]
    Gp = grptabT_ref.shape[1]

    # Camera / group gathers for the whole lane block: (21, Cp) @ (Cp, BL).
    cam = cam_ref[:]  # (1, BL)
    rowsC = jax.lax.broadcasted_iota(jnp.int32, (Cp, BL_T), 0)
    onehot_c = (rowsC == cam).astype(jnp.bfloat16)
    camg = _oh_dot_t(camtabT_ref[:], onehot_c)      # (21, BL)
    grp = grp_ref[:]
    rowsG = jax.lax.broadcasted_iota(jnp.int32, (Gp, BL_T), 0)
    onehot_g = (rowsG == grp).astype(jnp.bfloat16)
    intg = _oh_dot_t(grptabT_ref[:], onehot_g)      # (7, BL)

    # Point gather: per window, X = ptsT span/window slice @ onehot.
    rk = ranks_ref[:]  # (1, BL)
    xs = []
    for k in range(NSUB_T):
        base = wstart_ref[s * NSUB_T + k] * B
        if _SPAN:
            loc = rk[:, k * B:(k + 1) * B] - base
            for c, j0, onehot in _span_chunks(loc):
                win = ptsT_ref[:, pl.ds(base + j0 * 128, SPAN_W)]
                xs.append(_oh_dot_t(win, onehot))   # (3, 128)
        else:
            win = ptsT_ref[:, pl.ds(base, 2 * B)]   # (3, 2B)
            rk_k = rk[:, k * B:(k + 1) * B]         # (1, B)
            rows2 = jax.lax.broadcasted_iota(jnp.int32, (2 * B, B), 0)
            onehot = (rows2 == (rk_k - base)).astype(jnp.bfloat16)
            xs.append(_oh_dot_t(win, onehot))       # (3, B)
    X = jnp.concatenate(xs, axis=1)                 # (3, BL)

    outs = _linearize_math_t(refine, huber_delta, refine_mask, eps, X, camg,
                             intg, uv_ref[:], w_ref[:])
    camvals_ref[:] = outs[0]
    ptvals_ref[:] = outs[1]
    wc_ref[:] = outs[2].astype(wc_ref.dtype)
    if refine:
        grpvals_ref[:] = outs[3]
        wg_ref[:] = outs[4].astype(wg_ref.dtype)


def _oh_dot_t(vals: jnp.ndarray, onehot: jnp.ndarray):
    """Exact-f32 (k, N) = vals (k, M) @ onehot (M, N) at bf16 MXU rate."""
    hi, mid, lo = _split3(vals)
    oh = onehot if onehot.dtype == jnp.bfloat16 else onehot.astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    def d(v):
        return jax.lax.dot_general(v, oh, dn, preferred_element_type=jnp.float32)

    return d(hi) + d(mid) + d(lo)


@partial(jax.jit, static_argnames=("refine", "refine_mask", "huber_delta",
                                   "interpret", "w_dtype"))
def linearize_radial3_t(camtab: jnp.ndarray, grptab: jnp.ndarray,
                        pts_rank: jnp.ndarray, obs_cam: jnp.ndarray,
                        obs_grp: jnp.ndarray, ranks: jnp.ndarray,
                        obs_uvT: jnp.ndarray, obs_w: jnp.ndarray,
                        refine: bool, refine_mask: tuple, huber_delta: float,
                        interpret: bool = False, w_dtype: str = "f32"):
    """T-layout fused linearization.  Same contract as linearize_radial3
    except obs_uvT is (2, O) and the outputs are TRANSPOSED value tables:
    (camvalsT (43|85, O), ptvalsT (12, O), wcT (18, O)[, grpvalsT, wgT])."""
    if interpret is True:
        # Delegate to the (independently verified) sublane kernels +
        # transposes; interpret="kernel" instead runs the REAL kernel body
        # under pallas interpret mode (ADVICE r4 item 3).
        outs = linearize_radial3(camtab, grptab, pts_rank, obs_cam, obs_grp,
                                 ranks, obs_uvT.T, obs_w, refine=refine,
                                 refine_mask=refine_mask,
                                 huber_delta=huber_delta, interpret=True,
                                 w_dtype=w_dtype)
        return tuple(o.T for o in outs)
    interpret = bool(interpret)
    o = ranks.shape[0]
    c = camtab.shape[0]
    g = grptab.shape[0]
    p = pts_rank.shape[0]
    c_p = _ceil_to(max(c, 1), 8)
    g_p = _ceil_to(max(g, 1), 8)
    p_tab = _ceil_to(max(p, 1), B) + B
    o_p = _ceil_to(max(o, 1), BL_T)

    def padT(x, width):  # (k, O) -> (k, o_p)
        padn = o_p - x.shape[1]
        if padn <= 0:
            return x
        return jnp.pad(x, ((0, 0), (0, padn)), constant_values=width)

    ranks_p = padT(ranks.astype(jnp.int32).reshape(1, -1), p_tab - B)
    cam_p = padT(obs_cam.astype(jnp.int32).reshape(1, -1), c_p)
    grp_p = padT(obs_grp.astype(jnp.int32).reshape(1, -1), g_p)
    uv_p = padT(obs_uvT.astype(jnp.float32), 0)
    w_p = padT(obs_w.astype(jnp.float32).reshape(1, -1), 0)
    camtabT = _pad_rows(camtab.astype(jnp.float32), c_p).T  # (21, c_p)
    grptabT = _pad_rows(grptab.astype(jnp.float32), g_p).T  # (7, g_p)
    ptsT = _pad_rows(pts_rank.astype(jnp.float32), p_tab).T  # (3, p_tab)
    wstart = jnp.minimum(ranks_p[0, ::B] // B, p_tab // B - 2).astype(jnp.int32)

    cam_w = 85 if refine else 43
    wdt = jnp.bfloat16 if w_dtype == "bf16" else jnp.float32
    widths = [cam_w, 12, 18] + ([56, 21] if refine else [])
    dts = [jnp.float32, jnp.float32, wdt] + ([jnp.float32, wdt] if refine
                                             else [])
    outs = pl.pallas_call(
        partial(_linearize_t_kernel, refine, float(huber_delta),
                tuple(refine_mask), 1e-8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(o_p // BL_T,),
            in_specs=[
                pl.BlockSpec((1, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LIN_CAM_DIM, c_p), lambda s, ws: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((7, g_p), lambda s, ws: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, p_tab), lambda s, ws: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((wd, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM)
                for wd in widths
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((wd, o_p), dt)
                   for wd, dt in zip(widths, dts)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(wstart, ranks_p, cam_p, grp_p, uv_p, w_p, camtabT, grptabT, ptsT)
    return tuple(out[:, :o] for out in outs)


# Packed-symmetric row layouts (see _linearize_math_t packed=True).
# _PACK_POS[n][i][j] = row index of block entry (i, j) in the packed
# upper-triangular order ((i, j), j >= i, row-major).
def _pack_pos(n):
    pos, k = {}, 0
    for i in range(n):
        for j in range(i, n):
            pos[(i, j)] = k
            k += 1
    return pos


def _full_idx(n):
    """Static gather indices reconstructing a full (n, n) block table from
    packed upper-triangular columns."""
    pos = _pack_pos(n)
    return tuple(pos[(min(i, j), max(i, j))] for i in range(n)
                 for j in range(n))


_FULL66 = _full_idx(6)   # 36 ints into 21 packed columns
_FULL33 = _full_idx(3)   # 9 ints into 6 packed columns
_FULL77 = _full_idx(7)   # 49 ints into 28 packed columns


def _linearize_reduce_t_kernel(refine, huber_delta, refine_mask, eps,
                               wstart_ref, ranks_ref, cam_ref, grp_ref,
                               uv_ref, w_ref, camtabT_ref, grptabT_ref,
                               ptsT_ref, *out_refs):
    """Fused linearization + segment reduction: ONE pass over the obs table
    produces the camera/group normal-equation sums (resident accumulators)
    and the per-rank point sums (windowed resident accumulator) directly —
    the per-obs value tables never touch HBM (they were ~330 MB/pass at the
    500-cam bench shape), and the reduce contractions REUSE the gather
    one-hots already in VMEM (dot_general contracting the lane dim of both
    operands).  Only the Schur coupling table W is written out (the CG loop
    re-reads it every matvec)."""
    if refine:
        camred_ref, ptred_ref, wc_ref, grpred_ref, wg_ref = out_refs
    else:
        camred_ref, ptred_ref, wc_ref = out_refs
    s = pl.program_id(0)
    Cp = camtabT_ref.shape[1]
    Gp = grptabT_ref.shape[1]

    @pl.when(s == 0)
    def _init():
        camred_ref[:] = jnp.zeros_like(camred_ref)
        ptred_ref[:] = jnp.zeros_like(ptred_ref)
        if refine:
            grpred_ref[:] = jnp.zeros_like(grpred_ref)

    cam = cam_ref[:]  # (1, BL)
    rowsC = jax.lax.broadcasted_iota(jnp.int32, (Cp, BL_T), 0)
    onehot_c = (rowsC == cam).astype(jnp.bfloat16)
    camg = _oh_dot_t(camtabT_ref[:], onehot_c)      # (21, BL)
    grp = grp_ref[:]
    rowsG = jax.lax.broadcasted_iota(jnp.int32, (Gp, BL_T), 0)
    onehot_g = (rowsG == grp).astype(jnp.bfloat16)
    intg = _oh_dot_t(grptabT_ref[:], onehot_g)      # (7, BL)

    rk = ranks_ref[:]  # (1, BL)
    xs = []
    ohs = []   # (k, c, base, j0, onehot) in span mode; (k, base, onehot) else
    for k in range(NSUB_T):
        base = wstart_ref[s * NSUB_T + k] * B
        if _SPAN:
            loc = rk[:, k * B:(k + 1) * B] - base
            for c, j0, onehot in _span_chunks(loc):
                win = ptsT_ref[:, pl.ds(base + j0 * 128, SPAN_W)]
                ohs.append((k, c, base, j0, onehot))
                xs.append(_oh_dot_t(win, onehot))   # (3, 128)
        else:
            win = ptsT_ref[:, pl.ds(base, 2 * B)]   # (3, 2B)
            rk_k = rk[:, k * B:(k + 1) * B]         # (1, B)
            rows2 = jax.lax.broadcasted_iota(jnp.int32, (2 * B, B), 0)
            onehot = (rows2 == (rk_k - base)).astype(jnp.bfloat16)
            ohs.append((k, None, base, None, onehot))
            xs.append(_oh_dot_t(win, onehot))       # (3, B)
    X = jnp.concatenate(xs, axis=1)                 # (3, BL)

    outs = _linearize_math_t(refine, huber_delta, refine_mask, eps, X, camg,
                             intg, uv_ref[:], w_ref[:], packed=True)
    camvals, ptvals, wc = outs[0], outs[1], outs[2]
    wc_ref[:] = wc.astype(wc_ref.dtype)
    if refine:
        grpvals, wg = outs[3], outs[4]
        wg_ref[:] = wg.astype(wg_ref.dtype)

    dn_tt = (((1,), (1,)), ((), ()))  # contract the lane dim of BOTH

    def _reduce_tt(vals, onehot, out_n):
        """(R, BL/B) x (N, BL/B) -> exact-f32 (R, N) via split3 stacked on
        sublanes: one MXU contraction instead of three."""
        r = vals.shape[0]
        v3 = jnp.concatenate(_split3(vals), axis=0)  # (3R, ·) bf16
        acc = jax.lax.dot_general(v3, onehot, dn_tt,
                                  preferred_element_type=jnp.float32)
        return acc[:r] + acc[r:2 * r] + acc[2 * r:]

    camred_ref[:] += _reduce_tt(camvals, onehot_c, Cp)
    if refine:
        grpred_ref[:] += _reduce_tt(grpvals, onehot_g, Gp)

    if _SPAN:
        for k, c, base, j0, onehot in ohs:
            pt_k = ptvals[:, k * B + c * 128:k * B + (c + 1) * 128]
            ptred_ref[:, pl.ds(base + j0 * 128, SPAN_W)] += _reduce_tt(
                pt_k, onehot, SPAN_W)
    else:
        for k, _c, base, _j0, onehot in ohs:
            pt_k = ptvals[:, k * B:(k + 1) * B]      # (9, B)
            ptred_ref[:, pl.ds(base, 2 * B)] += _reduce_tt(pt_k, onehot,
                                                           2 * B)


@partial(jax.jit, static_argnames=("refine", "refine_mask", "huber_delta",
                                   "interpret", "w_dtype"))
def linearize_reduce_radial3_t(camtab: jnp.ndarray, grptab: jnp.ndarray,
                               pts_rank: jnp.ndarray, obs_cam: jnp.ndarray,
                               obs_grp: jnp.ndarray, ranks: jnp.ndarray,
                               obs_uvT: jnp.ndarray, obs_w: jnp.ndarray,
                               refine: bool, refine_mask: tuple,
                               huber_delta: float, interpret: bool = False,
                               w_dtype: str = "f32"):
    """Fused linearize + reduce (round-4 BA fixed-cost lever): returns
    ALREADY-REDUCED packed systems instead of per-obs value tables:

      (camred (C, 28|70), ptred_rank (P, 9), wcT (18, O)
       [, grpred (G, 35), wgT (21, O)])

    camred columns: [Hcc packed-sym 21 | gc 6 | (Hcg row-major 42) | cost 1];
    ptred columns:  [Hpp packed-sym 6 | gp 3] — RANK-indexed rows;
    grpred columns: [Hgg packed-sym 28 | gg 7].
    Full blocks reconstruct via the static _FULL66/_FULL33/_FULL77 gathers.
    Sharded solves psum camred/grpred and scatter+psum ptred exactly like
    the separate-reduction path.  Replaces linearize_radial3_t +
    segsum_table_t + segsum_sorted_t (measured 13.7 ms -> see PERF.md)."""
    o = ranks.shape[0]
    c = camtab.shape[0]
    g = grptab.shape[0]
    p = pts_rank.shape[0]
    if interpret is True:
        # CPU path: the (verified) un-fused pieces + XLA segment sums,
        # repacked to the fused return contract.  interpret="kernel" runs
        # the REAL fused kernel body under pallas interpret mode.
        outs = linearize_radial3_t(camtab, grptab, pts_rank, obs_cam,
                                   obs_grp, ranks, obs_uvT, obs_w,
                                   refine=refine, refine_mask=refine_mask,
                                   huber_delta=huber_delta, interpret=True,
                                   w_dtype=w_dtype)
        if refine:
            camvalsT, ptvalsT, wcT, grpvalsT, wgT = outs
        else:
            camvalsT, ptvalsT, wcT = outs
        safe_rk = jnp.minimum(ranks, p)
        camred_f = jax.ops.segment_sum(camvalsT.T, obs_cam, c)
        pck6 = [i * 6 + j for i in range(6) for j in range(i, 6)]
        cam_cols = ([camred_f[:, k] for k in pck6]
                    + [camred_f[:, 36 + k] for k in range(6)])
        if refine:
            cam_cols += [camred_f[:, 42 + k] for k in range(42)]
        cam_cols += [camred_f[:, -1]]
        camred = jnp.stack(cam_cols, axis=1)
        ptred_f = jax.ops.segment_sum(ptvalsT.T, safe_rk, p + 1)[:p]
        pck3 = [i * 3 + j for i in range(3) for j in range(i, 3)]
        ptred = jnp.stack([ptred_f[:, k] for k in pck3]
                          + [ptred_f[:, 9 + k] for k in range(3)], axis=1)
        if refine:
            grpred_f = jax.ops.segment_sum(grpvalsT.T, obs_grp, g)
            pck7 = [i * 7 + j for i in range(7) for j in range(i, 7)]
            grpred = jnp.stack([grpred_f[:, k] for k in pck7]
                               + [grpred_f[:, 49 + k] for k in range(7)],
                               axis=1)
            return camred, ptred, wcT, grpred, wgT
        return camred, ptred, wcT
    interpret = bool(interpret)
    c_p = _ceil_to(max(c, 1), 8)
    g_p = _ceil_to(max(g, 1), 8)
    p_tab = _ceil_to(max(p, 1), B) + B
    o_p = _ceil_to(max(o, 1), BL_T)

    def padT(x, width):
        padn = o_p - x.shape[1]
        if padn <= 0:
            return x
        return jnp.pad(x, ((0, 0), (0, padn)), constant_values=width)

    ranks_p = padT(ranks.astype(jnp.int32).reshape(1, -1), p_tab - B)
    cam_p = padT(obs_cam.astype(jnp.int32).reshape(1, -1), c_p)
    grp_p = padT(obs_grp.astype(jnp.int32).reshape(1, -1), g_p)
    uv_p = padT(obs_uvT.astype(jnp.float32), 0)
    w_p = padT(obs_w.astype(jnp.float32).reshape(1, -1), 0)
    camtabT = _pad_rows(camtab.astype(jnp.float32), c_p).T  # (21, c_p)
    grptabT = _pad_rows(grptab.astype(jnp.float32), g_p).T  # (7, g_p)
    ptsT = _pad_rows(pts_rank.astype(jnp.float32), p_tab).T  # (3, p_tab)
    wstart = jnp.minimum(ranks_p[0, ::B] // B, p_tab // B - 2).astype(jnp.int32)

    cam_w = 70 if refine else 28
    wdt = jnp.bfloat16 if w_dtype == "bf16" else jnp.float32
    if refine:
        widths = [(cam_w, c_p), (9, p_tab), (18, o_p), (35, g_p), (21, o_p)]
        dts = [jnp.float32, jnp.float32, wdt, jnp.float32, wdt]
        out_specs = [
            pl.BlockSpec((cam_w, c_p), lambda s, ws: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, p_tab), lambda s, ws: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((18, BL_T), lambda s, ws: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((35, g_p), lambda s, ws: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((21, BL_T), lambda s, ws: (0, s),
                         memory_space=pltpu.VMEM),
        ]
    else:
        widths = [(cam_w, c_p), (9, p_tab), (18, o_p)]
        dts = [jnp.float32, jnp.float32, wdt]
        out_specs = [
            pl.BlockSpec((cam_w, c_p), lambda s, ws: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, p_tab), lambda s, ws: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((18, BL_T), lambda s, ws: (0, s),
                         memory_space=pltpu.VMEM),
        ]
    outs = pl.pallas_call(
        partial(_linearize_reduce_t_kernel, refine, float(huber_delta),
                tuple(refine_mask), 1e-8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(o_p // BL_T,),
            in_specs=[
                pl.BlockSpec((1, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LIN_CAM_DIM, c_p), lambda s, ws: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((7, g_p), lambda s, ws: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, p_tab), lambda s, ws: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
        ),
        out_shape=[jax.ShapeDtypeStruct(w, dt) for w, dt in zip(widths, dts)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wstart, ranks_p, cam_p, grp_p, uv_p, w_p, camtabT, grptabT, ptsT)
    if refine:
        camredT, ptredT, wcT, grpredT, wgT = outs
        return (camredT[:, :c].T, ptredT[:, :p].T, wcT[:, :o],
                grpredT[:, :g].T, wgT[:, :o])
    camredT, ptredT, wcT = outs
    return camredT[:, :c].T, ptredT[:, :p].T, wcT[:, :o]


def _segsum_table_t_kernel(idx_ref, vals_ref, out_ref):
    """out (k, n) += vals (k, BL) @ onehotT (BL, n); idx block (BL, 1)."""
    n = out_ref.shape[1]
    idx = idx_ref[:]  # (BL, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n), 1)
    onehot = (cols == idx).astype(jnp.bfloat16)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += _oh_dot_t(vals_ref[:], onehot)


@partial(jax.jit, static_argnames=("n", "interpret"))
def segsum_table_t(valsT: jnp.ndarray, idx: jnp.ndarray, n: int,
                   interpret: bool = False):
    """T-layout segment sum: valsT (k, O), idx (O,) -> (n, k).
    The contraction (k, BL) @ (BL, n) is an MXU-friendly small-M matmul
    (vs the sublane kernel's narrow outputs)."""
    if interpret is True:
        return segsum_table(valsT.T, idx, n, interpret=True)
    interpret = bool(interpret)
    k, o = valsT.shape
    o_p = _ceil_to(max(o, 1), BL_T)
    n_p = _ceil_to(max(n, 1), 8)
    idx_p = _pad_rows(idx.astype(jnp.int32).reshape(-1, 1), o_p, value=n_p)
    vals_p = jnp.pad(valsT, ((0, 0), (0, o_p - o))) if o_p > o else valsT
    out = pl.pallas_call(
        _segsum_table_t_kernel,
        grid=(o_p // BL_T,),
        in_specs=[
            pl.BlockSpec((BL_T, 1), lambda s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, BL_T), lambda s: (0, s), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, n_p), lambda s: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n_p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(idx_p, vals_p)
    return out[:, :n].T


def _segsum_sorted_t_kernel(wstart_ref, ranks_ref, vals_ref, out_ref):
    """out (k, p_tab) windows += vals_k (k, B) @ onehotT (B, 2B)."""
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    for kk in range(NSUB_T):
        base = wstart_ref[s * NSUB_T + kk] * B
        if _SPAN:
            loc = ranks_ref[:, kk * B:(kk + 1) * B] - base   # row ranks
            for c, j0, onehot in _span_chunks(loc):
                vals_k = vals_ref[:, pl.ds(kk * B + c * 128, 128)]
                out_ref[:, pl.ds(base + j0 * 128, SPAN_W)] += _oh_dot_tt(
                    vals_k, onehot)
        else:
            rk = ranks_ref[pl.ds(kk * B, B), :]      # (B, 1)
            cols = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * B), 1)
            onehot = (cols == (rk - base)).astype(jnp.bfloat16)
            vals_k = vals_ref[:, pl.ds(kk * B, B)]   # (k, B)
            out_ref[:, pl.ds(base, 2 * B)] += _oh_dot_t(vals_k, onehot)


@partial(jax.jit, static_argnames=("p", "interpret"))
def segsum_sorted_t(valsT: jnp.ndarray, idx_sorted: jnp.ndarray, p: int,
                    interpret: bool = False):
    """T-layout sorted segment sum: valsT (k, O), dense sorted ranks ->
    (p, k).  Resident (k, p_tab) accumulator, lane-window scatters."""
    if interpret is True:
        return segsum_sorted(valsT.T, idx_sorted, p, interpret=True)
    interpret = bool(interpret)
    k, o = valsT.shape
    o_p = _ceil_to(max(o, 1), BL_T)
    p_tab = _ceil_to(max(p, 1), B) + B
    if _SPAN:
        idx_p = jnp.pad(idx_sorted.astype(jnp.int32).reshape(1, -1),
                        ((0, 0), (0, o_p - o)), constant_values=p_tab - B) \
            if o_p > o else idx_sorted.astype(jnp.int32).reshape(1, -1)
        idx_spec = pl.BlockSpec((1, BL_T), lambda s, ws: (0, s),
                                memory_space=pltpu.VMEM)
        wstart = jnp.minimum(idx_p[0, ::B] // B,
                             p_tab // B - 2).astype(jnp.int32)
    else:
        idx_p = _pad_rows(idx_sorted.astype(jnp.int32).reshape(-1, 1), o_p,
                          value=p_tab - B)
        idx_spec = pl.BlockSpec((BL_T, 1), lambda s, ws: (s, 0),
                                memory_space=pltpu.VMEM)
        wstart = jnp.minimum(idx_p[::B, 0] // B,
                             p_tab // B - 2).astype(jnp.int32)
    vals_p = jnp.pad(valsT, ((0, 0), (0, o_p - o))) if o_p > o else valsT
    out = pl.pallas_call(
        _segsum_sorted_t_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(o_p // BL_T,),
            in_specs=[
                idx_spec,
                pl.BlockSpec((k, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((k, p_tab), lambda s, ws: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((k, p_tab), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(wstart, idx_p, vals_p)
    return out[:, :p].T


def _schur_fwd_t_kernel(wstart_ref, ranks_ref, cam_ref, w_ref, vtabT_ref,
                        out_ref):
    """T-layout fused W^T v: out (3, p_tab) windows accumulate."""
    s = pl.program_id(0)
    ncam = vtabT_ref.shape[1]

    @pl.when(s == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    cam = cam_ref[:]  # (1, BL) lanes
    rowsC = jax.lax.broadcasted_iota(jnp.int32, (ncam, BL_T), 0)
    onehot_c = (rowsC == cam).astype(jnp.bfloat16)
    vg = _oh_dot_t(vtabT_ref[:], onehot_c)          # (6, BL)
    w = w_ref[:].astype(jnp.float32)                # (18, BL)
    wv = jnp.concatenate([
        sum(w[d * 3 + kk:d * 3 + kk + 1, :] * vg[d:d + 1, :]
            for d in range(6))
        for kk in range(3)
    ], axis=0)                                      # (3, BL)

    for kk in range(NSUB_T):  # static unroll: wv slices must be static
        base = wstart_ref[s * NSUB_T + kk] * B
        if _SPAN:
            loc = ranks_ref[:, kk * B:(kk + 1) * B] - base   # row ranks
            for c, j0, onehot in _span_chunks(loc):
                wv_k = wv[:, kk * B + c * 128:kk * B + (c + 1) * 128]
                out_ref[:, pl.ds(base + j0 * 128, SPAN_W)] += _oh_dot_tt(
                    wv_k, onehot)
        else:
            rk = ranks_ref[pl.ds(kk * B, B), :]      # (B, 1)
            cols = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * B), 1)
            onehot = (cols == (rk - base)).astype(jnp.bfloat16)
            wv_k = wv[:, kk * B:(kk + 1) * B]
            out_ref[:, pl.ds(base, 2 * B)] += _oh_dot_t(wv_k, onehot)


@partial(jax.jit, static_argnames=("p", "interpret"))
def schur_fwd_t(wT: jnp.ndarray, obs_cam: jnp.ndarray,
                idx_sorted: jnp.ndarray, vtab: jnp.ndarray, p: int,
                interpret: bool = False):
    """T-layout schur_fwd: wT (3D, O) [f32 or bf16], obs_cam (O,), sorted
    dense ranks, vtab (C, D) -> (p, 3) per-rank sums."""
    interpret = bool(interpret)
    dd3, o = wT.shape
    c = vtab.shape[0]
    o_p = _ceil_to(max(o, 1), BL_T)
    p_tab = _ceil_to(max(p, 1), B) + B
    c_p = _ceil_to(max(c, 1), 8)
    if _SPAN:
        ranks_p = jnp.pad(idx_sorted.astype(jnp.int32).reshape(1, -1),
                          ((0, 0), (0, o_p - o)),
                          constant_values=p_tab - B) \
            if o_p > o else idx_sorted.astype(jnp.int32).reshape(1, -1)
        rank_spec = pl.BlockSpec((1, BL_T), lambda s, ws: (0, s),
                                 memory_space=pltpu.VMEM)
        wstart = jnp.minimum(ranks_p[0, ::B] // B,
                             p_tab // B - 2).astype(jnp.int32)
    else:
        ranks_p = _pad_rows(idx_sorted.astype(jnp.int32).reshape(-1, 1), o_p,
                            value=p_tab - B)
        rank_spec = pl.BlockSpec((BL_T, 1), lambda s, ws: (s, 0),
                                 memory_space=pltpu.VMEM)
        wstart = jnp.minimum(ranks_p[::B, 0] // B,
                             p_tab // B - 2).astype(jnp.int32)
    cam_p = jnp.pad(obs_cam.astype(jnp.int32).reshape(1, -1),
                    ((0, 0), (0, o_p - o)), constant_values=c_p) \
        if o_p > o else obs_cam.astype(jnp.int32).reshape(1, -1)
    w_p = jnp.pad(wT, ((0, 0), (0, o_p - o))) if o_p > o else wT
    vtabT = _pad_rows(vtab.astype(jnp.float32), c_p).T  # (D, c_p)
    out = pl.pallas_call(
        _schur_fwd_t_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(o_p // BL_T,),
            in_specs=[
                rank_spec,
                pl.BlockSpec((1, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dd3, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dd3 // 3, c_p), lambda s, ws: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3, p_tab), lambda s, ws: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((3, p_tab), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(wstart, ranks_p, cam_p, w_p, vtabT)
    return out[:, :p].T


def _schur_bwd_t_kernel(wstart_ref, ranks_ref, cam_ref, w_ref, ztabT_ref,
                        out_ref):
    """T-layout fused b_c: zg windows gathered on lanes, camera reduce as
    (D, BL) @ onehotT (BL, n)."""
    s = pl.program_id(0)
    n = out_ref.shape[1]

    @pl.when(s == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    rk = ranks_ref[:]  # (1, BL) lanes
    zgs = []
    for kk in range(NSUB_T):
        base = wstart_ref[s * NSUB_T + kk] * B
        if _SPAN:
            loc = rk[:, kk * B:(kk + 1) * B] - base
            for c, j0, onehot in _span_chunks(loc):
                win = ztabT_ref[:, pl.ds(base + j0 * 128, SPAN_W)]
                zgs.append(_oh_dot_t(win, onehot))   # (3, 128)
        else:
            win = ztabT_ref[:, pl.ds(base, 2 * B)]   # (3, 2B)
            rk_k = rk[:, kk * B:(kk + 1) * B]        # (1, B)
            rows2 = jax.lax.broadcasted_iota(jnp.int32, (2 * B, B), 0)
            onehot = (rows2 == (rk_k - base)).astype(jnp.bfloat16)
            zgs.append(_oh_dot_t(win, onehot))       # (3, B)
    zg = jnp.concatenate(zgs, axis=1)                # (3, BL)

    w = w_ref[:].astype(jnp.float32)                 # (3D, BL)
    d_out = w.shape[0] // 3
    bk = jnp.concatenate([
        sum(w[d * 3 + kk:d * 3 + kk + 1, :] * zg[kk:kk + 1, :]
            for kk in range(3))
        for d in range(d_out)
    ], axis=0)                                       # (D, BL)

    if _SPAN:
        # Lane-contracting reduce (the schur_mv_t bwd-phase form): row cam
        # one-hot + dot_general contracting the lane dim of BOTH operands —
        # measured 4.22 -> see PERF round 5 vs the sublane-oriented
        # (BL, n) build + deep matmul it replaces.
        cam = cam_ref[:]                             # (1, BL) row
        rowsC = jax.lax.broadcasted_iota(jnp.int32, (n, BL_T), 0)
        onehot_c = (rowsC == cam).astype(jnp.bfloat16)
        b3 = jnp.concatenate(_split3(bk), axis=0)    # (3D, BL)
        acc = jax.lax.dot_general(b3, onehot_c, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out_ref[:] += (acc[:d_out] + acc[d_out:2 * d_out]
                       + acc[2 * d_out:])
    else:
        cam = cam_ref[:]  # (BL, 1) column
        cols = jax.lax.broadcasted_iota(jnp.int32, (cam.shape[0], n), 1)
        onehot_c = (cols == cam).astype(jnp.bfloat16)
        out_ref[:] += _oh_dot_t(bk, onehot_c)


@partial(jax.jit, static_argnames=("n", "interpret"))
def schur_bwd_t(wT: jnp.ndarray, obs_cam: jnp.ndarray,
                idx_sorted: jnp.ndarray, ztab: jnp.ndarray, n: int,
                interpret: bool = False):
    """T-layout schur_bwd: wT (3D, O), sorted dense ranks into ztab (P, 3),
    obs_cam (O,) -> (n, D).

    interpret=True delegates to the sublane kernels (CPU tests);
    interpret="kernel" runs THIS kernel body under pallas interpret mode —
    the advisor-requested path that executes the real kernel math in CI
    (ADVICE r4: a regression in the kernel body would otherwise only be
    caught by the on-chip script)."""
    if interpret is True:
        return schur_bwd(wT.T, obs_cam, idx_sorted, ztab, n, interpret=True)
    interpret = bool(interpret)
    dd3, o = wT.shape
    p_z = ztab.shape[0]
    o_p = _ceil_to(max(o, 1), BL_T)
    p_tab = _ceil_to(max(p_z, 1), B) + B
    n_p = _ceil_to(max(n, 1), 8)
    ranks_l = jnp.pad(idx_sorted.astype(jnp.int32).reshape(1, -1),
                      ((0, 0), (0, o_p - o)), constant_values=p_tab - B) \
        if o_p > o else idx_sorted.astype(jnp.int32).reshape(1, -1)
    if _SPAN:
        cam_p = jnp.pad(obs_cam.astype(jnp.int32).reshape(1, -1),
                        ((0, 0), (0, o_p - o)), constant_values=n_p) \
            if o_p > o else obs_cam.astype(jnp.int32).reshape(1, -1)
        cam_spec = pl.BlockSpec((1, BL_T), lambda s, ws: (0, s),
                                memory_space=pltpu.VMEM)
    else:
        cam_p = _pad_rows(obs_cam.astype(jnp.int32).reshape(-1, 1), o_p,
                          value=n_p)
        cam_spec = pl.BlockSpec((BL_T, 1), lambda s, ws: (s, 0),
                                memory_space=pltpu.VMEM)
    w_p = jnp.pad(wT, ((0, 0), (0, o_p - o))) if o_p > o else wT
    ztabT = _pad_rows(ztab.astype(jnp.float32), p_tab).T  # (3, p_tab)
    wstart = jnp.minimum(ranks_l[0, ::B] // B, p_tab // B - 2).astype(jnp.int32)
    out = pl.pallas_call(
        _schur_bwd_t_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(o_p // BL_T,),
            in_specs=[
                pl.BlockSpec((1, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                cam_spec,
                pl.BlockSpec((dd3, BL_T), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, p_tab), lambda s, ws: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((dd3 // 3, n_p), lambda s, ws: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((dd3 // 3, n_p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(wstart, ranks_l, cam_p, w_p, ztabT)
    return out[:, :n].T


def _oh_dot_tt(vals: jnp.ndarray, onehot: jnp.ndarray):
    """Exact-f32 (k, N) = vals (k, M) @ onehot (N, M)^T at bf16 MXU rate —
    the lane dim of BOTH operands contracts, so gather-orientation one-hots
    are reused for scatters/reduces without a transpose."""
    hi, mid, lo = _split3(vals)
    oh = onehot if onehot.dtype == jnp.bfloat16 else onehot.astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))

    def d(v):
        return jax.lax.dot_general(v, oh, dn, preferred_element_type=jnp.float32)

    return d(hi) + d(mid) + d(lo)


def _schur_mv_t_kernel(combine, wstart_ref, ranks_ref, cam_ref, w_ref,
                       vtabT_ref, hinvT_ref, hccT_ref, y_ref, bc_ref, z_ref):
    """Fused Schur matvec round trip: grid (2, nblocks).  Phase 0 accumulates
    y = W^T v into the resident (3, p_tab) output; phase 1 applies the
    window-resident Hpp^-1 on the fly and reduces b_c = W (Hpp^-1 y) into the
    resident camera accumulator.  One kernel launch per CG iteration instead
    of schur_fwd_t + XLA Hpp^-1 glue + schur_bwd_t; y stays in VMEM between
    phases (constant-index output block)."""
    ph = pl.program_id(0)
    s = pl.program_id(1)
    ncam = vtabT_ref.shape[1]

    @pl.when((ph == 0) & (s == 0))
    def _init():
        y_ref[:] = jnp.zeros_like(y_ref)
        bc_ref[:] = jnp.zeros_like(bc_ref)

    cam = cam_ref[:]  # (1, BL)
    rowsC = jax.lax.broadcasted_iota(jnp.int32, (ncam, BL_T), 0)
    onehot_c = (rowsC == cam).astype(jnp.bfloat16)
    rk = ranks_ref[:]  # (1, BL)
    w = w_ref[:].astype(jnp.float32)  # (18, BL)

    @pl.when(ph == 0)
    def _fwd():
        vg = _oh_dot_t(vtabT_ref[:], onehot_c)       # (6, BL)
        wv = jnp.concatenate([
            sum(w[d * 3 + kk:d * 3 + kk + 1, :] * vg[d:d + 1, :]
                for d in range(6))
            for kk in range(3)
        ], axis=0)                                   # (3, BL)
        for kk in range(NSUB_T):
            base = wstart_ref[s * NSUB_T + kk] * B
            if _SPAN:
                loc = rk[:, kk * B:(kk + 1) * B] - base
                for c, j0, onehot in _span_chunks(loc):
                    y_ref[:, pl.ds(base + j0 * 128, SPAN_W)] += _oh_dot_tt(
                        wv[:, kk * B + c * 128:kk * B + (c + 1) * 128],
                        onehot)
            else:
                rk_k = rk[:, kk * B:(kk + 1) * B]
                rows2 = jax.lax.broadcasted_iota(jnp.int32, (2 * B, B), 0)
                onehot = (rows2 == (rk_k - base)).astype(jnp.bfloat16)
                y_ref[:, pl.ds(base, 2 * B)] += _oh_dot_tt(
                    wv[:, kk * B:(kk + 1) * B], onehot)

    # Phase boundary: apply the window-resident Hpp^-1 ONCE over the whole
    # rank table (9 lane-muls over ~p lanes — negligible) instead of per
    # 2B window; the bwd gathers then read the z table directly.
    @pl.when((ph == 1) & (s == 0) & _SPAN)
    def _ztab():
        yt = y_ref[:]                                # (3, p_tab)
        ht = hinvT_ref[:]                            # (9, p_tab)
        z_ref[:] = jnp.concatenate([
            sum(ht[i * 3 + j:i * 3 + j + 1, :] * yt[j:j + 1, :]
                for j in range(3))
            for i in range(3)
        ], axis=0)

    @pl.when(ph == 1)
    def _bwd():
        zgs = []
        for kk in range(NSUB_T):
            base = wstart_ref[s * NSUB_T + kk] * B
            if _SPAN:
                loc = rk[:, kk * B:(kk + 1) * B] - base
                for c, j0, onehot in _span_chunks(loc):
                    win = z_ref[:, pl.ds(base + j0 * 128, SPAN_W)]
                    zgs.append(_oh_dot_t(win, onehot))   # (3, 128)
            else:
                ywin = y_ref[:, pl.ds(base, 2 * B)]      # (3, 2B)
                hwin = hinvT_ref[:, pl.ds(base, 2 * B)]  # (9, 2B)
                zwin = jnp.concatenate([
                    sum(hwin[i * 3 + j:i * 3 + j + 1, :] * ywin[j:j + 1, :]
                        for j in range(3))
                    for i in range(3)
                ], axis=0)                               # (3, 2B)
                rk_k = rk[:, kk * B:(kk + 1) * B]
                rows2 = jax.lax.broadcasted_iota(jnp.int32, (2 * B, B), 0)
                onehot = (rows2 == (rk_k - base)).astype(jnp.bfloat16)
                zgs.append(_oh_dot_t(zwin, onehot))      # (3, B)
        zg = jnp.concatenate(zgs, axis=1)            # (3, BL)
        bk = jnp.concatenate([
            sum(w[d * 3 + kk:d * 3 + kk + 1, :] * zg[kk:kk + 1, :]
                for kk in range(3))
            for d in range(6)
        ], axis=0)                                   # (6, BL)
        b3 = jnp.concatenate(_split3(bk), axis=0)    # (18, BL)
        acc = jax.lax.dot_general(b3, onehot_c, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        bc_ref[:] += acc[:6] + acc[6:12] + acc[12:18]

    if combine:
        # Final combine S v = Hcc_d v - W Hpp^-1 W^T v in-kernel: 36
        # lane-muls over the (6, c_p) resident tables, removing the
        # per-CG-iteration XLA einsum + subtract glue from the PCG loop.
        @pl.when((ph == 1) & (s == pl.num_programs(1) - 1))
        def _comb():
            v = vtabT_ref[:]                         # (D, c_p)
            h = hccT_ref[:]                          # (D*D, c_p)
            dd = v.shape[0]
            hv = jnp.concatenate([
                sum(h[d * dd + e:d * dd + e + 1, :] * v[e:e + 1, :]
                    for e in range(dd))
                for d in range(dd)
            ], axis=0)
            bc_ref[:] = hv - bc_ref[:]


@partial(jax.jit, static_argnames=("p", "interpret"))
def schur_mv_t(wT: jnp.ndarray, obs_cam: jnp.ndarray,
               idx_sorted: jnp.ndarray, vtab: jnp.ndarray,
               hinv_rank: jnp.ndarray, p: int, hcc_d=None,
               interpret: bool = False):
    """Fused CG matvec over the coupling table: returns
    (bc (C, D) = W Hpp^-1 W^T v reduced per camera, y (p, 3) = W^T v per
    rank).  hinv_rank is the (p, 3, 3) damped point-block inverse in RANK
    space.  Single kernel, two grid phases; W is read twice (its ~53 MB
    bf16 is ~0.13 ms of the measured ~5.7 ms/CG-iter — the savings are the
    second launch, the XLA Hpp^-1 glue and the y/z HBM round trips).
    With hcc_d (C, D, D) given, the first return is instead the FULL Schur
    matvec S v = hcc_d v - W Hpp^-1 W^T v (combined in-kernel)."""
    if interpret is True:
        y = schur_fwd_t(wT, obs_cam, idx_sorted, vtab, p, interpret=True)
        z = jnp.einsum("pij,pj->pi", hinv_rank, y)
        bc = schur_bwd_t(wT, obs_cam, idx_sorted, z, vtab.shape[0],
                         interpret=True)
        if hcc_d is not None:
            bc = jnp.einsum("cij,cj->ci", hcc_d, vtab) - bc
        return bc, y
    interpret = bool(interpret)
    dd3, o = wT.shape
    c = vtab.shape[0]
    o_p = _ceil_to(max(o, 1), BL_T)
    p_tab = _ceil_to(max(p, 1), B) + B
    c_p = _ceil_to(max(c, 1), 8)
    ranks_p = jnp.pad(idx_sorted.astype(jnp.int32).reshape(1, -1),
                      ((0, 0), (0, o_p - o)), constant_values=p_tab - B) \
        if o_p > o else idx_sorted.astype(jnp.int32).reshape(1, -1)
    cam_p = jnp.pad(obs_cam.astype(jnp.int32).reshape(1, -1),
                    ((0, 0), (0, o_p - o)), constant_values=c_p) \
        if o_p > o else obs_cam.astype(jnp.int32).reshape(1, -1)
    w_p = jnp.pad(wT, ((0, 0), (0, o_p - o))) if o_p > o else wT
    vtabT = _pad_rows(vtab.astype(jnp.float32), c_p).T      # (6, c_p)
    hinvT = _pad_rows(hinv_rank.reshape(p, 9).astype(jnp.float32),
                      p_tab).T                              # (9, p_tab)
    d_cam = dd3 // 3
    combine = hcc_d is not None
    if combine:
        hccT = _pad_rows(hcc_d.reshape(c, d_cam * d_cam).astype(jnp.float32),
                         c_p).T                             # (D*D, c_p)
    else:
        hccT = jnp.zeros((d_cam * d_cam, c_p), jnp.float32)
    wstart = jnp.minimum(ranks_p[0, ::B] // B, p_tab // B - 2).astype(jnp.int32)
    y_out, bc_out = pl.pallas_call(
        partial(_schur_mv_t_kernel, combine),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(2, o_p // BL_T),
            in_specs=[
                pl.BlockSpec((1, BL_T), lambda ph, s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BL_T), lambda ph, s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dd3, BL_T), lambda ph, s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dd3 // 3, c_p), lambda ph, s, ws: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9, p_tab), lambda ph, s, ws: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_cam * d_cam, c_p), lambda ph, s, ws: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((3, p_tab), lambda ph, s, ws: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dd3 // 3, c_p), lambda ph, s, ws: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((3, p_tab), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((3, p_tab), jnp.float32),
                   jax.ShapeDtypeStruct((dd3 // 3, c_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wstart, ranks_p, cam_p, w_p, vtabT, hinvT, hccT)
    return bc_out[:, :c].T, y_out[:, :p].T


def sort_and_rank_payload(seg_ids: jnp.ndarray, valid: jnp.ndarray,
                          n_segments: int, payloads: tuple):
    """sort_and_rank variant that carries payload columns through ONE
    multi-operand lax.sort instead of argsort + per-column reorder gathers
    (measured 128 ms/solve at 1.48M obs: 90 ms argsort + 37 ms for five
    XLA row gathers — the gathers ride along the sorting network for far
    less than their standalone cost).

    Returns (payloads_sorted, seg_sorted, ranks, rank_to_seg, rank_valid);
    seg_sorted is the sorted segment id column (junk where invalid)."""
    o = seg_ids.shape[0]
    key = jnp.where(valid, seg_ids.astype(jnp.int32), jnp.int32(2**30))
    sorted_ = jax.lax.sort(
        (key, seg_ids.astype(jnp.int32)) + tuple(payloads),
        num_keys=1, is_stable=True)
    key_s = sorted_[0]
    seg_sorted = sorted_[1]
    payloads_s = sorted_[2:]
    valid_s = key_s < jnp.int32(2**30)
    newflag = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (key_s[1:] != key_s[:-1]).astype(jnp.int32),
    ])
    ranks = jnp.cumsum(newflag) - 1
    ranks = jnp.where(valid_s, ranks, jnp.int32(2**30))
    drop = n_segments
    ranks_c = jnp.minimum(ranks, drop)
    rank_to_seg = jnp.zeros((n_segments + 1,), jnp.int32).at[ranks_c].set(
        seg_sorted, mode="drop")[:n_segments]
    rank_valid = jnp.zeros((n_segments + 1,), bool).at[ranks_c].set(
        valid_s, mode="drop")[:n_segments]
    return payloads_s, seg_sorted, ranks, rank_to_seg, rank_valid
