"""PatchMatch multi-view stereo refinement: slanted-plane hypotheses with
red-black checkerboard propagation.

Capability parity with the reference's dense stage — OpenMVS
``DensifyPointCloud`` (spawned at src/main.cpp:161) *is* PatchMatch MVS.
The plane-sweep stage (tpusfm.dense.depth) recovers fronto-parallel depth;
this module refines it with per-pixel slanted planes, which removes the
staircase/fattening bias on oblique surfaces.

TPU-native formulation (SURVEY.md §7 hard part 6): PatchMatch's sequential
spatial propagation becomes *checkerboard sweeps* — every pixel of one
parity updates simultaneously from its 4 neighbors of the other parity, so
each half-iteration is a fully regular, vectorizable array program:

  - state: per-pixel inverse depth + unit normal (a plane through the
    backprojected point),
  - candidates per step: self, the 4 neighbor planes re-intersected with
    the pixel's own ray (true slanted propagation), depth/normal
    perturbations with geometrically shrinking scale, and a random restart,
  - cost: zero-mean NCC over a dilated sparse window, evaluated by
    intersecting each window ray with the hypothesis plane and bilinearly
    sampling the source views (best-k aggregation over sources, like the
    plane sweep),
  - update: masked argmin on the active parity.

Compile-friendliness: the window offsets, the candidate set, and the sweep
sequence are all ``lax.scan`` loops, so the compiled graph contains ONE
sample-and-accumulate block, ONE candidate-evaluation block, and ONE sweep
block regardless of window size / candidate count / iteration count.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PatchMatchConfig:
    n_iters: int = 4            # full iterations (each = 2 parity sweeps)
    window_radius: int = 4      # window half-extent in px
    dilation: int = 2           # sample spacing inside the window
    best_k: int = 2             # best-k source aggregation (as plane sweep)
    perturb_depth: float = 0.20     # initial relative inv-depth perturbation
    perturb_normal_deg: float = 25.0
    cost_invalid: float = 2.0
    min_ndotr: float = 0.05     # reject grazing plane/ray intersections
    min_sigma: float = 1e-3     # reject textureless NCC windows


def _window_offsets(cfg: PatchMatchConfig) -> jnp.ndarray:
    r, d = cfg.window_radius, cfg.dilation
    steps = list(range(-r, r + 1, d))
    return jnp.asarray([(dy, dx) for dy in steps for dx in steps], jnp.float32)


def _bilinear(img, vv, uu):
    """Sample img (H, W) at float coords (vv, uu) of any shape (clamped)."""
    H, W = img.shape
    v0 = jnp.clip(jnp.floor(vv).astype(jnp.int32), 0, H - 2)
    u0 = jnp.clip(jnp.floor(uu).astype(jnp.int32), 0, W - 2)
    fv = jnp.clip(vv - v0, 0.0, 1.0)
    fu = jnp.clip(uu - u0, 0.0, 1.0)
    a = img[v0, u0]
    b = img[v0, u0 + 1]
    c = img[v0 + 1, u0]
    e = img[v0 + 1, u0 + 1]
    return a * (1 - fv) * (1 - fu) + b * (1 - fv) * fu + c * fv * (1 - fu) + e * fv * fu


def _shift2d(img, dy: int, dx: int, fill=0.0):
    """Static integer shift: out[y, x] = img[y+dy, x+dx], `fill` outside."""
    H, W = img.shape
    out = jnp.full_like(img, fill)
    ys = slice(max(0, -dy), min(H, H - dy))
    xs = slice(max(0, -dx), min(W, W - dx))
    ysrc = slice(max(0, dy), min(H, H + dy))
    xsrc = slice(max(0, dx), min(W, W + dx))
    return out.at[ys, xs].set(img[ysrc, xsrc])


def _plane_cost(n, c, ref_img, src_imgs, fx, fy, cx, cy, fxs, fys, cxs, cys,
                R_rel, t_rel, offsets, cfg: PatchMatchConfig):
    """NCC cost of the per-pixel plane field (n (H,W,3), c (H,W)) where the
    plane at pixel p is {X : n_p . X = c_p} in the reference camera frame.
    Returns cost (H, W) in [0, 2] (2 = invalid)."""
    H, W = ref_img.shape
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] * jnp.ones((H, 1), jnp.float32)
    S = src_imgs.shape[0]
    No = offsets.shape[0]

    def accum(sums, off):
        s_r, s_rr, s_s, s_ss, s_rs, oob = sums
        dy, dx = off[0], off[1]
        # Window ray at q = p + (dx, dy) — intersect with p's plane.
        rqx = (xs + dx - cx) / fx
        rqy = (ys + dy - cy) / fy
        ndotr = n[..., 0] * rqx + n[..., 1] * rqy + n[..., 2]
        safe = jnp.abs(ndotr) > cfg.min_ndotr
        s = c / jnp.where(safe, ndotr, jnp.where(ndotr >= 0, cfg.min_ndotr, -cfg.min_ndotr))
        # Reference sample: clamp-to-edge bilinear at the shifted pixel.
        rv = _bilinear(ref_img, ys + dy, xs + dx)
        # Intersection point X = s * (rqx, rqy, 1), projected to each source.
        Xs = (
            R_rel[:, None, None, :, 0] * (s * rqx)[None, ..., None]
            + R_rel[:, None, None, :, 1] * (s * rqy)[None, ..., None]
            + R_rel[:, None, None, :, 2] * s[None, ..., None]
            + t_rel[:, None, None, :]
        )  # (S, H, W, 3)
        z = Xs[..., 2]
        zsafe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        us = Xs[..., 0] / zsafe * fxs[:, None, None] + cxs[:, None, None]
        vs = Xs[..., 1] / zsafe * fys[:, None, None] + cys[:, None, None]
        inb = (us >= 0) & (us <= W - 1) & (vs >= 0) & (vs <= H - 1) & (z > 0) & safe
        sv = jax.vmap(_bilinear)(src_imgs, vs, us)  # (S, H, W)
        sv = jnp.where(inb, sv, 0.0)
        return (
            s_r + rv, s_rr + rv * rv, s_s + sv, s_ss + sv * sv,
            s_rs + sv * rv[None], oob + (~inb).astype(jnp.float32),
        ), None

    init = (
        jnp.zeros((H, W)), jnp.zeros((H, W)), jnp.zeros((S, H, W)),
        jnp.zeros((S, H, W)), jnp.zeros((S, H, W)), jnp.zeros((S, H, W)),
    )
    (s_r, s_rr, s_s, s_ss, s_rs, oob), _ = jax.lax.scan(accum, init, offsets)

    N = float(No)
    mr = s_r / N
    ms = s_s / N
    var_r = jnp.maximum(s_rr / N - mr * mr, 0.0)
    var_s = jnp.maximum(s_ss / N - ms * ms, 0.0)
    cov = s_rs / N - mr[None] * ms
    sig = jnp.sqrt(var_r[None] * var_s)
    ncc = jnp.clip(cov / jnp.maximum(sig, cfg.min_sigma**2), -1.0, 1.0)
    # A window is valid when most samples landed in-bounds and has texture.
    ok = (oob < 0.3 * N) & (var_r[None] > cfg.min_sigma**2)
    cost_s = jnp.where(ok, 1.0 - ncc, cfg.cost_invalid)  # (S, H, W)

    k = min(cfg.best_k, S)
    neg_topk, _ = jax.lax.top_k(-jnp.moveaxis(cost_s, 0, -1), k)
    return -jnp.mean(neg_topk, axis=-1)  # (H, W)


def _plane_from_state(inv_d, n, rpx, rpy):
    """Plane constant c = n . X_p with X_p = r_p / inv_d (ray z-component 1)."""
    ndotr = n[..., 0] * rpx + n[..., 1] * rpy + n[..., 2]
    return ndotr / jnp.maximum(inv_d, 1e-9)


def _state_from_plane(n, c, rpx, rpy, min_ndotr):
    """Inverse depth of pixel p's ray intersected with plane (n, c)."""
    ndotr = n[..., 0] * rpx + n[..., 1] * rpy + n[..., 2]
    safe = jnp.abs(ndotr) > min_ndotr
    inv_d = jnp.where(safe, ndotr / jnp.where(jnp.abs(c) < 1e-9, 1e-9, c), 0.0)
    return inv_d, safe


def _random_unit_normal(key, shape):
    """Camera-facing (n_z < 0) random unit normals within ~60 deg of -z."""
    k1, k2 = jax.random.split(key)
    nx = 0.7 * (jax.random.uniform(k1, shape) * 2.0 - 1.0)
    ny = 0.7 * (jax.random.uniform(k2, shape) * 2.0 - 1.0)
    n = jnp.stack([nx, ny, -jnp.ones(shape)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def _perturb_normal(key, n, max_deg):
    """Small random rotation of each normal, kept camera-facing."""
    d = jax.random.normal(key, n.shape) * jnp.radians(max_deg) * 0.5
    out = n + d
    out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-9)
    # Keep facing the camera (n_z < 0); a flip is plane-equivalent anyway.
    return jnp.where(out[..., 2:3] < -0.05, out, n)


@partial(jax.jit, static_argnames=("cfg",))
def patchmatch_refine(
    ref_img: jnp.ndarray,     # (H, W) float32 raw intensities
    src_imgs: jnp.ndarray,    # (S, H, W)
    K: jnp.ndarray,           # (3, 3) reference-view intrinsics
    K_src: jnp.ndarray,       # (S, 3, 3) per-source intrinsics
    R_rel: jnp.ndarray,       # (S, 3, 3) ref-cam -> src-cam
    t_rel: jnp.ndarray,       # (S, 3)
    inv_d_init: jnp.ndarray,  # (H, W) plane-sweep inverse depth init
    inv_lo: jnp.ndarray,      # scalar: min inverse depth of the search range
    inv_hi: jnp.ndarray,      # scalar: max inverse depth
    key: jnp.ndarray,
    cfg: PatchMatchConfig = PatchMatchConfig(),
):
    """Refine a fronto-parallel depth init into slanted-plane depth.

    Returns (depth (H, W), cost (H, W), normal (H, W, 3))."""
    H, W = ref_img.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    fxs, fys = K_src[:, 0, 0], K_src[:, 1, 1]
    cxs, cys = K_src[:, 0, 2], K_src[:, 1, 2]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] * jnp.ones((H, 1), jnp.float32)
    rpx = (xs - cx) / fx
    rpy = (ys - cy) / fy
    parity = ((jnp.arange(H)[:, None] + jnp.arange(W)[None, :]) % 2).astype(jnp.int32)
    offsets = _window_offsets(cfg)

    cost_fn = partial(
        _plane_cost, ref_img=ref_img, src_imgs=src_imgs,
        fxs=fxs, fys=fys, cxs=cxs, cys=cys,
        fx=fx, fy=fy, cx=cx, cy=cy, R_rel=R_rel, t_rel=t_rel,
        offsets=offsets, cfg=cfg,
    )

    n0 = jnp.zeros((H, W, 3)).at[..., 2].set(-1.0)  # fronto-parallel
    inv0 = jnp.clip(inv_d_init, inv_lo, inv_hi)
    cost0 = cost_fn(n0, _plane_from_state(inv0, n0, rpx, rpy))

    def half_sweep(state, xs_in):
        inv_d, n, cost = state
        key, phase, scale = xs_in
        c_cur = _plane_from_state(inv_d, n, rpx, rpy)
        # Candidate planes, stacked (Ncand, H, W, ...):
        cand_n, cand_c = [], []
        # 4 neighbor planes (checkerboard: neighbors are the other parity).
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nn = jnp.stack(
                [_shift2d(n[..., i], dy, dx, fill=0.0) for i in range(3)], axis=-1
            )
            nn = jnp.where(jnp.abs(nn[..., 2:3]) < 1e-6, n, nn)  # border fill
            cand_n.append(nn)
            cand_c.append(_shift2d(c_cur, dy, dx, fill=0.0))
        # Joint depth+normal perturbation (shrinking scale).
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        inv_p = jnp.clip(
            inv_d * jnp.exp(jax.random.normal(k1, (H, W)) * cfg.perturb_depth * scale),
            inv_lo, inv_hi,
        )
        n_p = _perturb_normal(k2, n, cfg.perturb_normal_deg * scale)
        cand_n.append(n_p)
        cand_c.append(_plane_from_state(inv_p, n_p, rpx, rpy))
        # Random restart (full-range exploration).
        inv_r = inv_lo + (inv_hi - inv_lo) * jax.random.uniform(k3, (H, W))
        n_r = _random_unit_normal(k4, (H, W))
        cand_n.append(n_r)
        cand_c.append(_plane_from_state(inv_r, n_r, rpx, rpy))
        # Normal-only perturbation at the current depth.
        n_o = _perturb_normal(k5, n, cfg.perturb_normal_deg * scale)
        cand_n.append(n_o)
        cand_c.append(_plane_from_state(inv_d, n_o, rpx, rpy))

        active = parity == phase

        def eval_cand(st, cand):
            inv_d, n, cost = st
            nn, cc = cand
            c_cost = cost_fn(nn, cc)
            inv_c, ok = _state_from_plane(nn, cc, rpx, rpy, cfg.min_ndotr)
            ok = ok & (inv_c > inv_lo * 0.5) & (inv_c < inv_hi * 2.0)
            better = active & ok & (c_cost < cost)
            return (
                jnp.where(better, inv_c, inv_d),
                jnp.where(better[..., None], nn, n),
                jnp.where(better, c_cost, cost),
            ), None

        state, _ = jax.lax.scan(
            eval_cand, (inv_d, n, cost), (jnp.stack(cand_n), jnp.stack(cand_c))
        )
        return state, None

    n_sweeps = 2 * cfg.n_iters
    keys = jax.random.split(key, n_sweeps)
    phases = jnp.arange(n_sweeps, dtype=jnp.int32) % 2
    scales = 0.5 ** (jnp.arange(n_sweeps, dtype=jnp.float32) // 2)
    (inv_d, n, cost), _ = jax.lax.scan(
        half_sweep, (inv0, n0, cost0), (keys, phases, scales)
    )
    depth = 1.0 / jnp.maximum(inv_d, 1e-9)
    return depth, cost, n
