"""Huber-robust bundle adjustment: Levenberg-Marquardt with a matrix-free
Schur-complement solve.

Capability parity with the reference BA (src/adjuster/BundleAdjuster.h):
- residual = reproject(angle-axis, t, intrinsics, X) - uv, 2 per observation
  (ReprojectCost::operator(), BundleAdjuster.h:40-68)
- Huber loss delta = 4 px (BundleAdjuster.h:109)
- gauge: first camera held constant (BundleAdjuster.h:105)
- parameter blocks: camera 6 (aa + t) (+4 intrinsics fx,fy,cx,cy when
  refine_intrinsics, mirroring the 4-param intrinsic block at :82-86),
  point 3
- solver: the reference uses Ceres SPARSE_SCHUR + JACOBI + EIGEN_SPARSE on
  one thread (:167-174).  CPU sparse Cholesky does not map to the MXU; the
  TPU-native equivalent (SURVEY.md §7 hard part 3) eliminates points exactly
  (3x3 block inverses, embarrassingly parallel) and solves the reduced
  camera system with block-Jacobi preconditioned CG where every operation
  is a segment-sum / gather over the observation table — no sparse matrix
  is ever materialized, and every step is an O(obs) dense-batched kernel.

The whole solve is one jit-able function of fixed-capacity arrays; masked
slots (cameras/points/observations) contribute zeros.  This same structure
shards over a device mesh by partitioning the observation table
(tpusfm.parallel.dist_ba).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core import lie


@dataclasses.dataclass(frozen=True)
class BAConfig:
    max_iters: int = 20            # LM outer iterations
    huber_delta: float = 4.0       # px (BundleAdjuster.h:109)
    refine_intrinsics: bool = False  # ADJUST_ALL parity (sparseBuilder.cpp:1292)
    cg_iters: int = 50
    cg_tol: float = 1e-2       # inexact Newton: CG only needs a descent
                               # direction — LM's accept/reject guards
                               # quality, and each saved CG iteration is a
                               # full gather/scatter pass over the obs table
    lambda_init: float = 1e-4
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    lambda_min: float = 1e-10
    lambda_max: float = 1e8
    converge_rtol: float = 3e-6    # accepted-step relative improvement below
                                   # this = converged.  Must sit above fp32
                                   # cost resolution (ulp/cost ~ 6e-8..1e-7,
                                   # and the summed cost carries reduction-
                                   # order noise ~10x that): a tighter value
                                   # makes the LM loop wander the flat
                                   # post-convergence valley on noise-driven
                                   # marginal accepts, so single-device and
                                   # sharded solves (different reduction
                                   # orders) would diverge after convergence.
    fix_first_cam: bool = True     # gauge (BundleAdjuster.h:105)
    obs_chunk: int = 65536         # obs per assembly chunk: per-obs (D, D)
                                   # blocks tile to (8, 128) on TPU (20-40x
                                   # padding), so assembly scans chunks
                                   # instead of materializing (O, D, D)
    axis_name: str | None = None   # mesh axis the observation table is
                                   # sharded over (distributed BA: partial
                                   # segment-sums are psum-reduced, SURVEY.md
                                   # §2.3 item 4); None = single device
    impl: str = "auto"             # "auto" | "pallas" | "xla".  The pallas
                                   # path sorts + rank-compacts the obs table
                                   # once per solve and runs every SCATTER
                                   # (segment-sum) as an MXU one-hot matmul
                                   # (ops/obs_table.py); gathers stay on XLA
                                   # (measured faster).  2.7x end-to-end at
                                   # 500 cams / 1.5M obs on v5e (0.92 -> 2.45
                                   # LM it/s).  Reductions land in point
                                   # space, so the path also runs sharded
                                   # under shard_map (psum like the XLA
                                   # path).  auto = pallas on TPU.
    pallas_interpret: bool = False  # run the pallas kernels in interpret
                                    # mode (CPU tests of the pallas path)
    # Direct dense-Schur solve for small camera systems: when the reduced
    # camera system is at most this many scalars wide (C * cam_dim), assemble
    # S densely and solve by Cholesky instead of running PCG.  A 20-camera
    # step-BA's S is 120x120 — one small factorization beats 50 CG sweeps
    # over the observation table (each a gather+segment-sum pass).  PCG
    # remains the at-scale path (500 cams -> S is 3000x3000 and the (P, C)
    # scatter table would not fit).
    dense_schur_max_dim: int = 384
    dense_schur_max_bytes: int = 256 * 1024 * 1024  # cap on peak coupling-table
                                   # residency (~2x the (P, C, D, 3) table:
                                   # Wp plus the intermediate A = Wp @ Hpp_inv)

    @property
    def cam_dim(self) -> int:
        return 10 if self.refine_intrinsics else 6

    def use_pallas(self) -> bool:
        if self.impl == "pallas":
            return True
        if self.impl == "xla":
            return False
        return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Residuals and Jacobians
# ---------------------------------------------------------------------------

def _project_one(cam_params: jnp.ndarray, intr_static: jnp.ndarray, X: jnp.ndarray,
                 refine_intrinsics: bool) -> jnp.ndarray:
    """Project one point through one camera given the packed parameter vector
    [aa(3), t(3)(, fx, fy, cx, cy)]. intr_static carries the full 7-vector
    (distortion always from here; focal/pp overridden when refined)."""
    aa = cam_params[:3]
    t = cam_params[3:6]
    if refine_intrinsics:
        intr = jnp.concatenate([cam_params[6:10], intr_static[4:7]])
    else:
        intr = intr_static
    Xc = lie.rotate_aa(aa, X) + t
    return cam.camera_to_pixel(intr, Xc)


def _residual_one(cam_params, X, intr_static, uv, refine_intrinsics):
    return _project_one(cam_params, intr_static, X, refine_intrinsics) - uv


def _obs_jacobians(cam_params_o, X_o, intr_o, uv_o, refine_intrinsics: bool):
    """Per-observation residual + Jacobians, vmapped over the obs table.
    Returns r (O, 2), Jc (O, 2, D), Jp (O, 2, 3)."""
    def per_obs(cp, X, intr, uv):
        r = _residual_one(cp, X, intr, uv, refine_intrinsics)
        Jc = jax.jacfwd(lambda c: _residual_one(c, X, intr, uv, refine_intrinsics))(cp)
        Jp = jax.jacfwd(lambda x: _residual_one(cp, x, intr, uv, refine_intrinsics))(X)
        return r, Jc, Jp

    return jax.vmap(per_obs)(cam_params_o, X_o, intr_o, uv_o)


def _huber_weight(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight sqrt(rho'(s)) for the Huber loss on the residual norm:
    w = 1 inside delta, delta/||r|| outside. (O,)"""
    nrm = jnp.linalg.norm(r, axis=-1)
    return jnp.sqrt(jnp.minimum(1.0, delta / jnp.maximum(nrm, 1e-12)))


def robust_cost(r: jnp.ndarray, mask: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Total Huber cost over masked observations."""
    s = jnp.sum(r * r, axis=-1)
    nrm = jnp.sqrt(s + 1e-20)
    quad = 0.5 * s
    lin = delta * (nrm - 0.5 * delta)
    return jnp.sum(jnp.where(nrm <= delta, quad, lin) * mask)


# ---------------------------------------------------------------------------
# Schur-complement building blocks (all segment-sums over the obs table)
# ---------------------------------------------------------------------------

def _maybe_psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name else x


def _chunk_obs(arrs, n_chunks: int):
    """Reshape leading obs axis to (n_chunks, chunk, ...); O must divide."""
    return [a.reshape(n_chunks, a.shape[0] // n_chunks, *a.shape[1:]) for a in arrs]


def _build_system(cam_params, points, intr_static, obs_cam, obs_pt, obs_uv,
                  obs_w, cfg: BAConfig):
    """Assemble the segment-summed normal-equation pieces.

    TPU layout note: per-observation block tensors like (O, 6, 6) tile to
    (8, 128) on their trailing dims — a 20-40x padding blow-up that OOMs at
    millions of observations.  So (a) assembly runs as a lax.scan over
    observation chunks, materializing only (chunk, D, D) at a time, and
    (b) the coupling blocks persist flattened as (O, D*3) (lane dim D*3
    instead of 3), cutting the resident footprint ~8x."""
    C = cam_params.shape[0]
    P = points.shape[0]
    D = cfg.cam_dim
    O = obs_cam.shape[0]
    ax = cfg.axis_name
    n_chunks = max(1, O // max(cfg.obs_chunk, 1))
    while O % n_chunks:
        n_chunks -= 1
    ocam_c, opt_c, ouv_c, ow_c = _chunk_obs([obs_cam, obs_pt, obs_uv, obs_w], n_chunks)

    def chunk_body(carry, inp):
        Hcc, Hpp, gc, gp = carry
        ocam, opt, ouv, ow = inp
        cp_o = cam_params[ocam]
        X_o = points[opt]
        intr_o = intr_static[ocam]
        r, Jc, Jp = _obs_jacobians(cp_o, X_o, intr_o, ouv, cfg.refine_intrinsics)
        w = (_huber_weight(r, cfg.huber_delta) * ow)[:, None]
        r = r * w
        Jc = Jc * w[..., None]
        Jp = Jp * w[..., None]
        Hcc += jax.ops.segment_sum(jnp.einsum("oki,okj->oij", Jc, Jc), ocam, C)
        Hpp += jax.ops.segment_sum(jnp.einsum("oki,okj->oij", Jp, Jp), opt, P)
        gc += jax.ops.segment_sum(jnp.einsum("oki,ok->oi", Jc, r), ocam, C)
        gp += jax.ops.segment_sum(jnp.einsum("oki,ok->oi", Jp, r), opt, P)
        Wo_flat = jnp.einsum("oki,okj->oij", Jc, Jp).reshape(-1, D * 3)
        return (Hcc, Hpp, gc, gp), Wo_flat

    init = (
        jnp.zeros((C, D, D)), jnp.zeros((P, 3, 3)),
        jnp.zeros((C, D)), jnp.zeros((P, 3)),
    )
    if ax:
        # Under shard_map the accumulators are device-varying; mark the
        # zero init accordingly or the scan carry types disagree.
        init = jax.tree_util.tree_map(lambda z: jax.lax.pcast(z, ax, to='varying'), init)
    (Hcc, Hpp, gc, gp), Wo_chunks = jax.lax.scan(
        chunk_body, init, (ocam_c, opt_c, ouv_c, ow_c)
    )
    Wo = Wo_chunks.reshape(O, D * 3)  # flattened (O, D*3) coupling blocks
    Hcc = _maybe_psum(Hcc, ax)
    Hpp = _maybe_psum(Hpp, ax)
    gc = _maybe_psum(gc, ax)
    gp = _maybe_psum(gp, ax)
    return Wo, Hcc, Hpp, gc, gp


def _schur_matvec(v, Hcc_d, Hpp_inv, Wo, obs_cam, obs_pt, C, P, axis_name=None):
    """Matrix-free S @ v for the reduced camera system
    S = Hcc - W Hpp^{-1} W^T, with v (C, D).  Wo is the flattened (O, D*3)
    coupling table.  With a sharded observation table, both segment-sums
    reduce over the mesh axis."""
    D = v.shape[-1]
    Wo3 = Wo.reshape(-1, D, 3)
    # y_p = sum_{o in p} W_o^T v_{cam(o)}
    Wv = jnp.einsum("oij,oi->oj", Wo3, v[obs_cam])  # (O, 3)
    y = _maybe_psum(jax.ops.segment_sum(Wv, obs_pt, P), axis_name)  # (P, 3)
    z = jnp.einsum("pij,pj->pi", Hpp_inv, y)  # (P, 3)
    back = jnp.einsum("oij,oj->oi", Wo3, z[obs_pt])  # (O, D)
    WHWv = _maybe_psum(jax.ops.segment_sum(back, obs_cam, C), axis_name)  # (C, D)
    Hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
    return Hv - WHWv


def _schur_diag_blocks(Hcc_d, Hpp_inv, Wo, obs_cam, obs_pt, C, cfg, axis_name=None):
    """Exact diagonal blocks of S for the block-Jacobi preconditioner
    (the TPU analog of Ceres' SCHUR_JACOBI).  Chunked like _build_system to
    avoid a resident (O, D, D) tensor."""
    D = Hcc_d.shape[-1]
    O = obs_cam.shape[0]
    n_chunks = max(1, O // max(cfg.obs_chunk, 1))
    while O % n_chunks:
        n_chunks -= 1
    Wo_c, ocam_c, opt_c = _chunk_obs([Wo, obs_cam, obs_pt], n_chunks)

    def body(acc, inp):
        Wf, ocam, opt = inp
        W3 = Wf.reshape(-1, D, 3)
        contrib = jnp.einsum("oij,ojk,olk->oil", W3, Hpp_inv[opt], W3)
        return acc + jax.ops.segment_sum(contrib, ocam, C), None

    acc0 = jnp.zeros((C, D, D))
    if axis_name:
        acc0 = jax.lax.pcast(acc0, axis_name, to="varying")
    acc, _ = jax.lax.scan(body, acc0, (Wo_c, ocam_c, opt_c))
    return Hcc_d - _maybe_psum(acc, axis_name)


def _pcg(matvec, b, M_inv_blocks, iters: int, tol: float):
    """Block-Jacobi preconditioned conjugate gradients on (C, D) vectors."""
    def apply_M(r):
        return jnp.einsum("cij,cj->ci", M_inv_blocks, r)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    b2 = jnp.sum(b * b)

    def body(carry):
        x, r, p, rz, it = carry
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_M(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    def cond(carry):
        _, r, _, _, it = carry
        return (it < iters) & (jnp.sum(r * r) > tol * tol * jnp.maximum(b2, 1e-30))

    x, r, *_ = jax.lax.while_loop(cond, body, (x0, r0, p0, rz0, 0))
    return x


def _dense_schur_solve(Hcc_d, Hpp_inv, Wo3, obs_cam, obs_pt, rhs, upd_mask,
                       axis_name=None):
    """Assemble the reduced camera system S = Hcc - W Hpp^-1 W^T densely and
    solve S dc = rhs by Cholesky.  Exact (no CG truncation) and a single
    small factorization — the fast path for step-BAs with few cameras.

    Per-point camera coupling is gathered into a (P, C, D, 3) table with one
    segment-sum over linearized (point, cam) ids; the off-diagonal Schur
    blocks are then two batched einsum contractions on the MXU.

    Sharded correctness: Wp must be psum-reduced BEFORE the quadratic
    contraction — a per-shard Wp would drop every cross-shard coupling term
    W_pc Hpp^-1 W_pe^T where the two observations of point p live on
    different devices (S is quadratic in W, so psum-ing S2 after the einsum
    is wrong)."""
    C, D = Hcc_d.shape[0], Hcc_d.shape[-1]
    P = Hpp_inv.shape[0]
    lin = obs_pt * C + obs_cam
    Wp = jax.ops.segment_sum(Wo3.reshape(-1, D * 3), lin, P * C).reshape(P, C, D, 3)
    Wp = _maybe_psum(Wp, axis_name)
    A = jnp.einsum("pcdk,pkl->pcdl", Wp, Hpp_inv)
    S2 = jnp.einsum("pcdl,pejl->cdej", A, Wp)  # (C, D, C, D)
    idx = jnp.arange(C)
    S = (-S2).at[idx, :, idx, :].add(Hcc_d)
    # Freeze fixed cameras: zero their rows/cols, identity diagonal (keeps
    # S symmetric positive definite; their rhs is already zero).
    m = upd_mask[:, 0]
    S = S * (m[:, None, None, None] * m[None, None, :, None])
    eyeD = jnp.eye(D, dtype=S.dtype)
    S = S.at[idx, :, idx, :].add((1.0 - m)[:, None, None] * eyeD)
    Sm = S.reshape(C * D, C * D)
    L = jnp.linalg.cholesky(Sm)
    from jax.scipy.linalg import solve_triangular

    y = solve_triangular(L, rhs.reshape(C * D), lower=True)
    dc = solve_triangular(L.T, y, lower=False).reshape(C, D)
    # A failed factorization (non-PD from extreme conditioning) falls back
    # to the zero step — LM rejects it and raises lambda.
    dc = jnp.where(jnp.all(jnp.isfinite(dc)), dc, 0.0)
    return dc * upd_mask


def _dense_eligible(C, P, D, cfg: BAConfig) -> bool:
    # Peak residency is ~2x the (P, C, D, 3) table: the intermediate
    # A = einsum(Wp, Hpp_inv) materializes a second table of identical
    # size, so the byte cap is applied to 2x the table.
    return (
        C * D <= cfg.dense_schur_max_dim
        and 2 * P * C * D * 3 * 4 <= cfg.dense_schur_max_bytes
    )


def _damp_blocks(H, lam):
    """Marquardt-scaled LM damping: H + lam * diag(H) (Ceres' default
    scaling).  Scale-invariant — focal entries (~1e6) and rotation entries
    (~1) are damped proportionally — and it keeps the reduced camera system
    well-conditioned along the scene's scale-gauge null direction even at
    tiny lam (additive lam*I leaves that eigenvalue at ~lam, amplifying
    fp32 reduction-order noise by 1/lam into gauge drift; with diag scaling
    the floor is lam * typical-diagonal instead).  Diagonal entries of
    masked/empty blocks are floored so the blocks stay invertible."""
    n = H.shape[-1]
    idx = jnp.arange(n)
    d = jnp.maximum(H[..., idx, idx], 1e-6)
    return H.at[..., idx, idx].add(lam * d)


def _inv3(M):
    """Batched closed-form 3x3 inverse with ridge for masked/empty blocks."""
    M = M + 1e-12 * jnp.eye(3, dtype=M.dtype)
    return jnp.linalg.inv(M)


def _invD(M):
    D = M.shape[-1]
    M = M + 1e-12 * jnp.eye(D, dtype=M.dtype)
    return jnp.linalg.inv(M)


# ---------------------------------------------------------------------------
# Pallas path: every obs-table reduction as an MXU one-hot matmul
# ---------------------------------------------------------------------------

def _lm_pallas(cp0, points, intr_static, point_mask, upd_mask, pt_upd,
               obs_cam, obs_pt, obs_uv, obs_w, cfg: BAConfig):
    """LM loop where every obs-table SCATTER (assembly, Schur matvec,
    preconditioner) runs on the MXU one-hot kernels (ops/obs_table.py).

    The observation table is sorted by point id and rank-compacted once per
    solve (the windowed kernels' precondition); each reduction lands in rank
    space and is scattered to point space immediately (a ~P-row scatter,
    negligible), so all state stays in point space.  That makes the path
    shard_map-compatible: with cfg.axis_name set, each device reduces its
    observation shard locally and the point/camera systems are psum-reduced
    exactly like the XLA path (dist_ba)."""
    from ..ops import obs_table as ot

    C = cp0.shape[0]
    P = points.shape[0]
    D = cfg.cam_dim
    itp = cfg.pallas_interpret
    ax = cfg.axis_name

    order, ranks, rank_to_pt, rank_valid = ot.sort_and_rank(
        obs_pt, obs_w > 0, P
    )
    obs_cam = obs_cam[order]
    obs_pt = obs_pt[order]
    obs_uv = obs_uv[order]
    obs_w = obs_w[order]
    rank_scatter_ids = jnp.where(rank_valid, rank_to_pt, P)

    def _gather(table, idx):
        # Per-obs gathers stay on XLA: measured 7 ms/op at 1.5M rows on v5e
        # vs 8-12 ms for the one-hot matmul kernels (ops/obs_table.py
        # docstring) — XLA's native row gather wins, it's the SCATTERS the
        # pallas segsums replace.
        n = table.shape[0]
        ok = idx < n
        return jnp.where(ok[:, None], table[jnp.where(ok, idx, 0)], 0.0)

    def pt_reduce(vals):
        """(O, Dv) -> per-point sums (P, Dv), psum-reduced when sharded."""
        red_r = ot.segsum_sorted(vals, ranks, P, interpret=itp)
        red_p = jnp.zeros((P, vals.shape[1]), vals.dtype).at[rank_scatter_ids].add(
            jnp.where(rank_valid[:, None], red_r, 0.0), mode="drop"
        )
        return _maybe_psum(red_p, ax)

    def cam_reduce(vals):
        return _maybe_psum(ot.segsum_table(vals, obs_cam, C, interpret=itp), ax)

    cam_tab_width = D + 7

    def per_obs_tables(cp, pts):
        co = _gather(jnp.concatenate([cp, intr_static], axis=-1), obs_cam)
        cp_o, intr_o = co[:, :D], co[:, D:cam_tab_width]
        X_o = _gather(pts, obs_pt)
        return cp_o, intr_o, X_o

    def cost_of(cp, pts):
        cp_o, intr_o, X_o = per_obs_tables(cp, pts)
        r = jax.vmap(
            lambda c, x, i, u: _residual_one(c, x, i, u, cfg.refine_intrinsics)
        )(cp_o, X_o, intr_o, obs_uv)
        return _maybe_psum(robust_cost(r, obs_w, cfg.huber_delta), ax)

    def lm_step(carry):
        cp, pts, lam, cost, done, it = carry
        cp_o, intr_o, X_o = per_obs_tables(cp, pts)
        r, Jc, Jp = _obs_jacobians(cp_o, X_o, intr_o, obs_uv,
                                   cfg.refine_intrinsics)
        w = (_huber_weight(r, cfg.huber_delta) * obs_w)[:, None]
        r = r * w
        Jc = Jc * w[..., None]
        Jp = Jp * w[..., None]
        # Camera side: one fused (O, D*D + D) reduction.
        camvals = jnp.concatenate([
            jnp.einsum("oki,okj->oij", Jc, Jc).reshape(-1, D * D),
            jnp.einsum("oki,ok->oi", Jc, r),
        ], axis=-1)
        camred = cam_reduce(camvals)
        Hcc = camred[:, : D * D].reshape(C, D, D)
        gc = camred[:, D * D:]
        # Point side: one fused (O, 12) reduction.
        ptvals = jnp.concatenate([
            jnp.einsum("oki,okj->oij", Jp, Jp).reshape(-1, 9),
            jnp.einsum("oki,ok->oi", Jp, r),
        ], axis=-1)
        ptred = pt_reduce(ptvals)
        Hpp = ptred[:, :9].reshape(P, 3, 3)
        gp = ptred[:, 9:]
        Wo3 = jnp.einsum("oki,okj->oij", Jc, Jp)  # (O, D, 3), point-sorted

        Hcc_d = _damp_blocks(Hcc, lam)
        Hpp_inv = _inv3(_damp_blocks(Hpp, lam))

        # rhs = -gc + W Hpp^-1 gp
        z = jnp.einsum("pij,pj->pi", Hpp_inv, gp)
        back = jnp.einsum("oij,oj->oi", Wo3, _gather(z, obs_pt))
        rhs = (-gc + cam_reduce(back)) * upd_mask

        # Block-Jacobi preconditioner on the exact S diagonal.
        Hinv_o = _gather(Hpp_inv.reshape(P, 9), obs_pt).reshape(-1, 3, 3)
        contrib = jnp.einsum("oij,ojk,olk->oil", Wo3, Hinv_o, Wo3)
        S_diag = Hcc_d - cam_reduce(contrib.reshape(-1, D * D)).reshape(C, D, D)
        M_inv = _invD(S_diag)

        def mv(v):
            vm = v * upd_mask
            vg = _gather(vm, obs_cam)
            Wv = jnp.einsum("oij,oi->oj", Wo3, vg)
            y = pt_reduce(Wv)
            zz = jnp.einsum("pij,pj->pi", Hpp_inv, y)
            bk = jnp.einsum("oij,oj->oi", Wo3, _gather(zz, obs_pt))
            WHWv = cam_reduce(bk)
            Hv = jnp.einsum("cij,cj->ci", Hcc_d, vm)
            return (Hv - WHWv) * upd_mask

        dc = _pcg(mv, rhs, M_inv, cfg.cg_iters, cfg.cg_tol) * upd_mask
        dcg = _gather(dc, obs_cam)
        Wtdc = pt_reduce(jnp.einsum("oij,oi->oj", Wo3, dcg))
        dp = -jnp.einsum("pij,pj->pi", Hpp_inv, gp + Wtdc) * pt_upd

        cp_new = cp + dc
        pts_new = pts + dp
        new_cost = cost_of(cp_new, pts_new)
        accept = (new_cost < cost) & ~done
        cp = jnp.where(accept, cp_new, cp)
        pts = jnp.where(accept, pts_new, pts)
        cost_out = jnp.where(accept, new_cost, cost)
        lam = jnp.where(
            accept,
            jnp.maximum(lam * cfg.lambda_down, cfg.lambda_min),
            jnp.minimum(lam * cfg.lambda_up, cfg.lambda_max),
        )
        rel = jnp.abs(cost - cost_out) / jnp.maximum(cost, 1e-12)
        done = done | (accept & (rel < cfg.converge_rtol))
        return cp, pts, lam, cost_out, done, it + 1

    init_cost = cost_of(cp0, points)
    (cp, pts, lam, final_cost, _, n_it) = jax.lax.while_loop(
        lambda c: (c[5] < cfg.max_iters) & ~c[4],
        lm_step,
        (cp0, points, jnp.float32(cfg.lambda_init), init_cost,
         jnp.bool_(False), jnp.int32(0)),
    )
    return cp, pts, lam, init_cost, final_cost, n_it


# ---------------------------------------------------------------------------
# LM driver
# ---------------------------------------------------------------------------

def _pack_cam_params(intr, cam_rot, cam_t, cfg: BAConfig):
    if cfg.refine_intrinsics:
        return jnp.concatenate([cam_rot, cam_t, intr[:, :4]], axis=-1)
    return jnp.concatenate([cam_rot, cam_t], axis=-1)


def _unpack_cam_params(cp, intr_static, cfg: BAConfig):
    cam_rot = cp[:, :3]
    cam_t = cp[:, 3:6]
    if cfg.refine_intrinsics:
        intr = jnp.concatenate([cp[:, 6:10], intr_static[:, 4:7]], axis=-1)
    else:
        intr = intr_static
    return intr, cam_rot, cam_t


@partial(jax.jit, static_argnames=("cfg",))
def bundle_adjust(
    intr: jnp.ndarray,       # (C, 7)
    cam_rot: jnp.ndarray,    # (C, 3) axis-angle
    cam_t: jnp.ndarray,      # (C, 3)
    cam_mask: jnp.ndarray,   # (C,)
    points: jnp.ndarray,     # (P, 3)
    point_mask: jnp.ndarray, # (P,)
    obs_cam: jnp.ndarray,    # (O,)
    obs_pt: jnp.ndarray,     # (O,)
    obs_uv: jnp.ndarray,     # (O, 2)
    obs_mask: jnp.ndarray,   # (O,)
    cfg: BAConfig = BAConfig(),
    cam_free_mask: jnp.ndarray | None = None,  # (C,) — False freezes a camera
                                               # (local-BA support)
):
    """Run LM bundle adjustment. Returns (intr, cam_rot, cam_t, points, info)
    where info = {'initial_cost', 'final_cost', 'iterations', 'lambda'}
    (the reference prints initial/final RMSE + time, BundleAdjuster.h:134-139).
    """
    C = intr.shape[0]
    P = points.shape[0]
    D = cfg.cam_dim
    # Pad the obs table so the assembly chunk size divides it exactly
    # (padded rows have zero weight — harmless everywhere).
    O = obs_cam.shape[0]
    if O > cfg.obs_chunk and O % cfg.obs_chunk:
        pad = cfg.obs_chunk - (O % cfg.obs_chunk)
        obs_cam = jnp.concatenate([obs_cam, jnp.zeros(pad, obs_cam.dtype)])
        obs_pt = jnp.concatenate([obs_pt, jnp.zeros(pad, obs_pt.dtype)])
        obs_uv = jnp.concatenate([obs_uv, jnp.zeros((pad, 2), obs_uv.dtype)])
        obs_mask = jnp.concatenate([obs_mask, jnp.zeros(pad, obs_mask.dtype)])
    obs_w = obs_mask.astype(jnp.float32)
    # Gauge: freeze camera 0's block (first registered camera in slot 0).
    free = cam_mask if cam_free_mask is None else (cam_mask & cam_free_mask)
    upd_mask = free.astype(jnp.float32)[:, None]
    if cfg.fix_first_cam:
        upd_mask = upd_mask.at[0].set(0.0)
    pt_upd = point_mask.astype(jnp.float32)[:, None]

    cp0 = _pack_cam_params(intr, cam_rot, cam_t, cfg)
    intr_static = intr

    # Small camera systems take the dense direct-Schur XLA path on TPU when
    # impl is "auto": the pallas one-hot segment-sums pay off on million-row
    # obs tables, not on the small step-BA problems the dense solve targets.
    # An explicit impl="pallas" is always honored (tests rely on it to
    # exercise the kernels on dense-eligible sizes).
    if cfg.impl == "pallas" or (cfg.use_pallas() and not _dense_eligible(C, P, D, cfg)):
        cp, pts, lam, init_cost, final_cost, n_it = _lm_pallas(
            cp0, points, intr_static, point_mask, upd_mask, pt_upd,
            obs_cam, obs_pt, obs_uv, obs_w, cfg,
        )
        intr_out, rot_out, t_out = _unpack_cam_params(cp, intr_static, cfg)
        info = {
            "initial_cost": init_cost,
            "final_cost": final_cost,
            "lambda": lam,
            "iterations": n_it,
            "n_obs": jnp.sum(obs_mask),
        }
        return intr_out, rot_out, t_out, pts, info

    def cost_of(cp, pts):
        cpo = cp[obs_cam]
        Xo = pts[obs_pt]
        io = intr_static[obs_cam]
        r = jax.vmap(lambda c, x, i, u: _residual_one(c, x, i, u, cfg.refine_intrinsics))(
            cpo, Xo, io, obs_uv
        )
        return _maybe_psum(robust_cost(r, obs_w, cfg.huber_delta), cfg.axis_name)

    def lm_step(carry):
        cp, pts, lam, cost, done, it = carry

        Wo, Hcc, Hpp, gc, gp = _build_system(
            cp, pts, intr_static, obs_cam, obs_pt, obs_uv, obs_w, cfg
        )
        Wo3 = Wo.reshape(-1, D, 3)
        # Marquardt-scaled LM damping on the diagonal blocks.
        Hcc_d = _damp_blocks(Hcc, lam)
        Hpp_inv = _inv3(_damp_blocks(Hpp, lam))

        # Reduced system: S dc = -gc + W Hpp^-1 gp
        z = jnp.einsum("pij,pj->pi", Hpp_inv, gp)
        back = jnp.einsum("oij,oj->oi", Wo3, z[obs_pt])
        rhs = -gc + _maybe_psum(jax.ops.segment_sum(back, obs_cam, C), cfg.axis_name)
        rhs = rhs * upd_mask

        if _dense_eligible(C, P, D, cfg):
            dc = _dense_schur_solve(Hcc_d, Hpp_inv, Wo3, obs_cam, obs_pt,
                                    rhs, upd_mask, cfg.axis_name)
        else:
            S_diag = _schur_diag_blocks(Hcc_d, Hpp_inv, Wo, obs_cam, obs_pt, C, cfg,
                                        cfg.axis_name)
            M_inv = _invD(S_diag)

            def mv(v):
                return _schur_matvec(v * upd_mask, Hcc_d, Hpp_inv, Wo, obs_cam,
                                     obs_pt, C, P, cfg.axis_name) * upd_mask

            dc = _pcg(mv, rhs, M_inv, cfg.cg_iters, cfg.cg_tol) * upd_mask
        # Back-substitute points: dp = -Hpp^-1 (gp + W^T dc)
        Wtdc = _maybe_psum(jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", Wo3, dc[obs_cam]), obs_pt, P
        ), cfg.axis_name)
        dp = -jnp.einsum("pij,pj->pi", Hpp_inv, gp + Wtdc) * pt_upd

        cp_new = cp + dc
        pts_new = pts + dp
        new_cost = cost_of(cp_new, pts_new)
        accept = (new_cost < cost) & ~done
        cp = jnp.where(accept, cp_new, cp)
        pts = jnp.where(accept, pts_new, pts)
        cost_out = jnp.where(accept, new_cost, cost)
        lam = jnp.where(
            accept,
            jnp.maximum(lam * cfg.lambda_down, cfg.lambda_min),
            jnp.minimum(lam * cfg.lambda_up, cfg.lambda_max),
        )
        # Converged when an accepted step barely improves the cost.
        rel = jnp.abs(cost - cost_out) / jnp.maximum(cost, 1e-12)
        done = done | (accept & (rel < cfg.converge_rtol))
        return cp, pts, lam, cost_out, done, it + 1

    init_cost = cost_of(cp0, points)
    # A real while_loop (not scan): converged solves stop paying for the
    # remaining LM iterations on device — mid-reconstruction step-BAs
    # typically accept 2-4 steps and exit.
    (cp, pts, lam, final_cost, _, n_it) = jax.lax.while_loop(
        lambda c: (c[5] < cfg.max_iters) & ~c[4],
        lm_step,
        (cp0, points, jnp.float32(cfg.lambda_init), init_cost, jnp.bool_(False),
         jnp.int32(0)),
    )
    intr_out, rot_out, t_out = _unpack_cam_params(cp, intr_static, cfg)
    info = {
        "initial_cost": init_cost,
        "final_cost": final_cost,
        "lambda": lam,
        "iterations": n_it,
        "n_obs": _maybe_psum(jnp.sum(obs_mask), cfg.axis_name),
    }
    return intr_out, rot_out, t_out, pts, info


def bundle_adjust_scene(scene, cfg: BAConfig = BAConfig()):
    """Convenience wrapper over a tpusfm.sfm.scene.Scene."""
    intr, rot, t, pts, info = bundle_adjust(
        scene.intr, scene.cam_rot, scene.cam_t, scene.cam_mask,
        scene.points, scene.point_mask,
        scene.obs_cam, scene.obs_pt, scene.obs_uv, scene.obs_mask,
        cfg,
    )
    return scene.replace(intr=intr, cam_rot=rot, cam_t=t, points=pts), info
