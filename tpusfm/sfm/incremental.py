"""Incremental structure-from-motion engine.

Capability parity with the reference's two reconstruction paths:
- the production OpenMVG sequential engine driven by ``reconstruction()``
  (src/sparseBuilder/sparseBuilder.cpp:1283-1599: initial-pair bootstrap,
  P3P resection loop, triangulation, periodic BA, outlier rejection), and
- the hand-rolled ``SequentialActuator`` (src/actuator/SequentialActuator.h:
  85-233: two-view init, PnP registration with a <30-inlier frame-drop,
  triangulation, global BA).

TPU-first design (SURVEY.md §7 layers 6-7): the *entire* observation table
is preallocated from the track table — registration and triangulation only
flip masks and fill values, never grow structures.  The host Python loop
does integer scheduling (which image next); every numeric step — essential
RANSAC, PnP, masked N-view triangulation, bundle adjustment — is a jitted
fixed-shape kernel that compiles once and is reused across the sequence.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ba import bundle_adjust as ba
from ..core import camera as cam
from ..core import epipolar, lie, triangulate
from . import pnp as pnp_mod
from . import ransac as ransac_mod
from .scene import Scene, empty_scene


@dataclasses.dataclass(frozen=True)
class IncrementalConfig:
    # Parity values (see SURVEY.md §3.2/§3.4):
    min_init_matches: int = 50          # pair prune threshold (sparseBuilder.cpp:1204)
    min_pnp_inliers: int = 30           # frame-drop (SequentialActuator.h:193)
    essential_thresh_px: float = 4.0    # AC-RANSAC precision default (.cpp:1039)
    pnp_thresh_px: float = 8.0          # solvePnPRansac 8px (SequentialActuator.h:176)
    reproj_outlier_px: float = 4.0      # outlier washing threshold
    min_tri_angle_deg: float = 2.0
    ransac_iters: int = 512
    pnp_iters: int = 256
    max_views_per_track: int = 6        # N-view triangulation capacity
    ba_every: int = 3                   # global BA every k registrations
    final_ba_iters: int = 25
    step_ba_iters: int = 8
    ba: ba.BAConfig = dataclasses.field(
        default_factory=lambda: ba.BAConfig(max_iters=8, fix_first_cam=False)
    )
    init_candidates: int = 5


# ---------------------------------------------------------------------------
# Jitted kernels (fixed shapes, compiled once per run)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_iters",))
def _init_pair_kernel(key, x0n, x1n, valid, n_iters, thresh):
    """Essential RANSAC + pose recovery + triangulation for the seed pair.
    (Bootstrap parity: SequentialActuator::init, .h:85-136.)"""
    E, inl, n_inl = ransac_mod.ransac(
        key, x0n, x1n, valid,
        solver=epipolar.essential_8pt,
        scorer=epipolar.sampson_error,
        sample_size=8, n_iters=n_iters, inlier_thresh=thresh,
    )
    R, t, n_good, front, X = epipolar.recover_pose(E, x0n, x1n, w=inl.astype(x0n.dtype))
    good = inl & front
    return R, t, X, good, n_inl


@partial(jax.jit, static_argnames=("n_views",))
def _triangulate_tracks_kernel(rot_aa, cam_t, intr, view_idx, uv, vmask, n_views):
    """Masked N-view triangulation for a batch of tracks.

    rot_aa/cam_t/intr: (C, ...) camera state; view_idx (T, Vm), uv (T, Vm, 2),
    vmask (T, Vm).  Returns X (T, 3), max reproj err (T,), tri angle (T,).
    Uses normalized coordinates so intrinsic conditioning drops out."""
    del n_views
    R = lie.so3_exp(rot_aa)  # (C, 3, 3)
    P = jnp.concatenate([R, cam_t[..., None]], axis=-1)  # (C, 3, 4)

    Pv = P[view_idx]  # (T, Vm, 3, 4)
    intr_v = intr[view_idx]  # (T, Vm, 7)
    xn = cam.pixel_to_normal(intr_v, uv)  # (T, Vm, 2)
    X = jax.vmap(triangulate.triangulate_n_view)(Pv, xn, vmask.astype(xn.dtype))

    # Validation: reprojection in normalized coords, cheirality, parallax.
    Xc = jnp.einsum("tvij,tj->tvi", Pv[..., :3], X) + Pv[..., 3]
    z = Xc[..., 2]
    proj = Xc[..., :2] / jnp.where(jnp.abs(z[..., None]) < 1e-9, 1e-9, z[..., None])
    err_n = jnp.linalg.norm(proj - xn, axis=-1)
    fmean = 0.5 * (intr_v[..., 0] + intr_v[..., 1])
    err_px = err_n * fmean
    err_px = jnp.where(vmask & (z > 1e-4), err_px, jnp.where(vmask, 1e9, 0.0))
    max_err = jnp.max(err_px, axis=-1)

    centers = lie.camera_center(R, cam_t)[view_idx]  # (T, Vm, 3)
    rays = centers - X[:, None, :]
    rays = rays / jnp.maximum(jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-12)
    # Max pairwise angle approximated by min pairwise |cos| over valid views.
    cosm = jnp.einsum("tvi,twi->tvw", rays, rays)
    pair_ok = vmask[:, :, None] & vmask[:, None, :]
    cosm = jnp.where(pair_ok, cosm, 1.0)
    min_cos = jnp.min(cosm, axis=(-2, -1))
    angle = jnp.degrees(jnp.arccos(jnp.clip(min_cos, -1.0, 1.0)))
    return X, max_err, angle


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

class IncrementalEngine:
    """Host-side scheduler over jitted kernels.

    Inputs: per-view keypoints kp (V, N, >=2) pixel coords, per-view
    intrinsics (V, 7), the track table from tracks.build_tracks
    (track_ids (V, N) int32, n_tracks), and a PRNG key.
    """

    def __init__(self, kp, intr, track_ids, n_tracks, cfg: IncrementalConfig = IncrementalConfig(),
                 progress=None):
        self.cfg = cfg
        self.kp = np.asarray(kp)[..., :2].astype(np.float32)
        self.intr = np.asarray(intr, np.float32)
        self.track_ids = np.asarray(track_ids)
        self.V, self.N = self.track_ids.shape
        self.T = int(n_tracks)
        self.progress = progress or (lambda *a, **k: None)

        # Preallocated observation table: one row per (view, feat) with a track.
        vs, fs = np.nonzero(self.track_ids >= 0)
        self.obs_cam = vs.astype(np.int32)
        self.obs_pt = self.track_ids[vs, fs].astype(np.int32)
        self.obs_uv = self.kp[vs, fs]
        self.O = len(self.obs_cam)

        # Mutable reconstruction state (host).
        self.registered = np.zeros(self.V, bool)
        self.point_active = np.zeros(max(self.T, 1), bool)
        self.obs_ok = np.ones(self.O, bool)       # not washed out
        self.obs_inlier = np.zeros(self.O, bool)  # passes current gating
        self.aa = np.zeros((self.V, 3), np.float32)
        self.t = np.zeros((self.V, 3), np.float32)
        self.points = np.zeros((max(self.T, 1), 3), np.float32)
        self.gauge_cam = 0
        self.n_registered = 0
        self.barred = np.zeros(self.V, bool)  # views that failed registration
        self.log: list[str] = []

        # Pairwise correspondence counts from shared tracks.
        self._pair_counts = self._count_shared_tracks()

    # -- bookkeeping ------------------------------------------------------

    def _count_shared_tracks(self):
        """(V, V) number of shared tracks between view pairs."""
        counts = np.zeros((self.V, self.V), np.int32)
        track_views: dict[int, list[int]] = {}
        for o in range(self.O):
            track_views.setdefault(int(self.obs_pt[o]), []).append(int(self.obs_cam[o]))
        for views in track_views.values():
            for i in range(len(views)):
                for j in range(i + 1, len(views)):
                    a, b = views[i], views[j]
                    counts[a, b] += 1
                    counts[b, a] += 1
        return counts

    def _pair_correspondences(self, i, j):
        """Matched keypoints between views i and j via shared tracks.
        Returns (uv_i, uv_j, track_ids) as numpy arrays."""
        ti = self.track_ids[i]
        tj = self.track_ids[j]
        # Map track -> feature index per view.
        fi = {int(t): f for f, t in enumerate(ti) if t >= 0}
        shared = []
        for f, t in enumerate(tj):
            if t >= 0 and int(t) in fi:
                shared.append((fi[int(t)], f, int(t)))
        if not shared:
            return np.zeros((0, 2), np.float32), np.zeros((0, 2), np.float32), np.zeros(0, np.int32)
        a, b, tr = map(np.asarray, zip(*shared))
        return self.kp[i, a], self.kp[j, b], tr.astype(np.int32)

    def _obs_mask(self):
        return (
            self.registered[self.obs_cam]
            & self.point_active[self.obs_pt]
            & self.obs_ok
            & self.obs_inlier
        )

    # -- pipeline stages --------------------------------------------------

    def select_init_pair(self, key):
        """Best seed pair: high correspondence count and non-degenerate
        geometry (scene-initializer parity: MAX_PAIR / STELLAR scoring,
        sparseBuilder.cpp:1443-1467)."""
        cfg = self.cfg
        iu = np.triu_indices(self.V, 1)
        counts = self._pair_counts[iu]
        order = np.argsort(counts)[::-1][: cfg.init_candidates]
        best = None
        for rank, oi in enumerate(order):
            i, j = int(iu[0][oi]), int(iu[1][oi])
            if counts[oi] < cfg.min_init_matches:
                continue
            uvi, uvj, tr = self._pair_correspondences(i, j)
            x0, x1, valid = self._pad_pair(uvi, uvj, i, j)
            f = float(self.intr[i, 0])
            key, k = jax.random.split(key)
            R, t, X, good, n_inl = _init_pair_kernel(
                k, x0, x1, valid, cfg.ransac_iters, cfg.essential_thresh_px / f
            )
            good_np = np.asarray(good)[: len(tr)]
            n_good = int(good_np.sum())
            if n_good < cfg.min_init_matches:
                continue
            # Parallax score: median triangulation angle of the seed cloud.
            Xn = np.asarray(X)[: len(tr)][good_np]
            c1 = np.asarray(lie.camera_center(R, t))
            a0 = Xn / np.maximum(np.linalg.norm(Xn, axis=-1, keepdims=True), 1e-12)
            a1 = Xn - c1
            a1 = a1 / np.maximum(np.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
            ang = np.degrees(np.arccos(np.clip((a0 * a1).sum(-1), -1, 1)))
            if np.median(ang) < self.cfg.min_tri_angle_deg:
                continue
            score = n_good * min(np.median(ang), 20.0)
            if best is None or score > best[0]:
                best = (score, i, j, R, t, X, good_np, tr)
        if best is None:
            raise RuntimeError("no valid initial pair (scene too degenerate)")
        return best[1:], key

    def _pad_pair(self, uvi, uvj, i, j):
        n = self.N
        x0 = np.zeros((n, 2), np.float32)
        x1 = np.zeros((n, 2), np.float32)
        valid = np.zeros(n, bool)
        m = len(uvi)
        x0[:m] = cam.pixel_to_normal(jnp.asarray(self.intr[i]), jnp.asarray(uvi))
        x1[:m] = cam.pixel_to_normal(jnp.asarray(self.intr[j]), jnp.asarray(uvj))
        valid[:m] = True
        return jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(valid)

    def bootstrap(self, key):
        (i, j, R, t, X, good, tr), key = self.select_init_pair(key)
        self.gauge_cam = i
        self.registered[[i, j]] = True
        self.aa[i] = 0.0
        self.t[i] = 0.0
        self.aa[j] = np.asarray(lie.so3_log(R))
        self.t[j] = np.asarray(t)
        tr_good = tr[good]
        self.points[tr_good] = np.asarray(X)[: len(tr)][good]
        self.point_active[tr_good] = True
        # Activate the seed observations.
        sel = np.isin(self.obs_pt, tr_good) & np.isin(self.obs_cam, [i, j])
        self.obs_inlier |= sel
        self.n_registered = 2
        self.log.append(f"bootstrap views ({i},{j}): {len(tr_good)} seed points")
        self.progress("reconstruction", 2.0 / self.V)
        return key

    def next_view(self):
        """Unregistered view observing the most active points."""
        score = np.zeros(self.V, np.int64)
        usable = self.point_active[self.obs_pt] & self.obs_ok
        np.add.at(score, self.obs_cam[usable], 1)
        score[self.registered | self.barred] = -1
        v = int(np.argmax(score))
        return (v, int(score[v])) if score[v] > 0 else (None, 0)

    def register_view(self, v, key):
        """PnP-RANSAC registration (parity: SequentialActuator.h:169-196)."""
        cfg = self.cfg
        rows = np.nonzero(
            (self.obs_cam == v) & self.point_active[self.obs_pt] & self.obs_ok
        )[0]
        n = self.N
        X = np.zeros((n, 3), np.float32)
        xn = np.zeros((n, 2), np.float32)
        valid = np.zeros(n, bool)
        m = min(len(rows), n)
        X[:m] = self.points[self.obs_pt[rows[:m]]]
        xn[:m] = np.asarray(
            cam.pixel_to_normal(jnp.asarray(self.intr[v]), jnp.asarray(self.obs_uv[rows[:m]]))
        )
        valid[:m] = True
        f = float(self.intr[v, 0])
        key, k = jax.random.split(key)
        aa, t, inl, n_inl = pnp_mod.pnp_ransac(
            k, jnp.asarray(X), jnp.asarray(xn), jnp.asarray(valid),
            n_iters=cfg.pnp_iters, thresh_norm=cfg.pnp_thresh_px / f,
        )
        n_inl = int(n_inl)
        if n_inl < cfg.min_pnp_inliers:
            self.log.append(f"view {v}: dropped ({n_inl} PnP inliers < {cfg.min_pnp_inliers})")
            return False, key
        self.registered[v] = True
        self.aa[v] = np.asarray(aa)
        self.t[v] = np.asarray(t)
        inl_np = np.asarray(inl)[:m]
        self.obs_inlier[rows[:m][inl_np]] = True
        self.n_registered += 1
        self.log.append(f"view {v}: registered with {n_inl} PnP inliers")
        return True, key

    def triangulate_new(self):
        """Triangulate every inactive track with >= 2 registered views."""
        cfg = self.cfg
        Vm = cfg.max_views_per_track
        usable = self.registered[self.obs_cam] & self.obs_ok
        cand_rows = np.nonzero(usable & ~self.point_active[self.obs_pt])[0]
        if len(cand_rows) == 0:
            return 0
        # Group rows by track.
        order = np.argsort(self.obs_pt[cand_rows], kind="stable")
        rows = cand_rows[order]
        pts = self.obs_pt[rows]
        uniq, starts, counts = np.unique(pts, return_index=True, return_counts=True)
        sel = counts >= 2
        uniq, starts, counts = uniq[sel], starts[sel], counts[sel]
        if len(uniq) == 0:
            return 0
        Tb = len(uniq)
        view_idx = np.zeros((Tb, Vm), np.int32)
        uv = np.zeros((Tb, Vm, 2), np.float32)
        vmask = np.zeros((Tb, Vm), bool)
        for ti in range(Tb):
            rr = rows[starts[ti] : starts[ti] + min(counts[ti], Vm)]
            L = len(rr)
            view_idx[ti, :L] = self.obs_cam[rr]
            uv[ti, :L] = self.obs_uv[rr]
            vmask[ti, :L] = True
        X, max_err, angle = _triangulate_tracks_kernel(
            jnp.asarray(self.aa), jnp.asarray(self.t), jnp.asarray(self.intr),
            jnp.asarray(view_idx), jnp.asarray(uv), jnp.asarray(vmask), Vm,
        )
        ok = (
            (np.asarray(max_err) < cfg.reproj_outlier_px)
            & (np.asarray(angle) > cfg.min_tri_angle_deg)
            & np.isfinite(np.asarray(X)).all(axis=-1)
        )
        new_tracks = uniq[ok]
        self.points[new_tracks] = np.asarray(X)[ok]
        self.point_active[new_tracks] = True
        # Activate their registered-view observations.
        sel_obs = np.isin(self.obs_pt, new_tracks) & self.registered[self.obs_cam] & self.obs_ok
        self.obs_inlier |= sel_obs
        return int(ok.sum())

    # -- BA + washing ------------------------------------------------------

    def _scene_arrays(self):
        mask = self._obs_mask()
        return dict(
            intr=jnp.asarray(self.intr),
            cam_rot=jnp.asarray(self.aa),
            cam_t=jnp.asarray(self.t),
            cam_mask=jnp.asarray(self.registered),
            points=jnp.asarray(self.points),
            point_mask=jnp.asarray(self.point_active),
            obs_cam=jnp.asarray(self.obs_cam),
            obs_pt=jnp.asarray(self.obs_pt),
            obs_uv=jnp.asarray(self.obs_uv),
            obs_mask=jnp.asarray(mask),
        )

    def run_ba(self, iters: int):
        cfg = dataclasses.replace(self.cfg.ba, max_iters=iters, fix_first_cam=False)
        free = self.registered.copy()
        free[self.gauge_cam] = False
        args = self._scene_arrays()
        intr, rot, t, pts, info = ba.bundle_adjust(
            cfg=cfg, cam_free_mask=jnp.asarray(free), **args
        )
        # np.array (copy): device buffers are read-only as numpy views.
        self.aa = np.array(rot)
        self.t = np.array(t)
        self.points = np.array(pts)
        if self.cfg.ba.refine_intrinsics:
            self.intr = np.array(intr)
        return info

    def wash_outliers(self):
        """Deactivate high-residual observations and starved points
        (parity: the engine-internal outlier rejection, SURVEY.md §3.2)."""
        args = self._scene_arrays()
        sc = Scene(**{k: v for k, v in args.items()},
                   colors=jnp.zeros((len(self.points), 3), jnp.uint8))
        errs = np.asarray(sc.reprojection_errors())
        mask = np.asarray(args["obs_mask"])
        bad = mask & (errs > self.cfg.reproj_outlier_px)
        self.obs_ok[bad] = False
        self.obs_inlier[bad] = False
        # Deactivate points with < 2 surviving observations.
        alive = self._obs_mask()
        cnt = np.bincount(self.obs_pt[alive], minlength=len(self.point_active))
        starved = self.point_active & (cnt < 2)
        self.point_active[starved] = False
        return int(bad.sum()), int(starved.sum())

    # -- main loop ---------------------------------------------------------

    def run(self, key=None) -> Scene:
        cfg = self.cfg
        key = jax.random.PRNGKey(0) if key is None else key
        key = self.bootstrap(key)
        self.triangulate_new()
        self.run_ba(cfg.step_ba_iters)
        self.wash_outliers()

        since_ba = 0
        max_steps = 3 * self.V  # hard stop: every view gets ~3 attempts
        steps = 0
        while self.n_registered < self.V and steps < max_steps:
            steps += 1
            v, n2d3d = self.next_view()
            if v is None:
                break
            ok, key = self.register_view(v, key)
            if not ok:
                # Frame drop (parity: SequentialActuator.h:193-196); bar the
                # view so selection moves on.  Barred views get one retry
                # pass after the map has grown (below).
                self.barred[v] = True
                continue
            self.triangulate_new()
            since_ba += 1
            if since_ba >= cfg.ba_every:
                self.run_ba(cfg.step_ba_iters)
                self.wash_outliers()
                since_ba = 0
            self.progress("reconstruction", self.n_registered / self.V)
            # Give previously dropped views another chance once the map grew.
            if self.barred.any() and since_ba == 0:
                self.barred[:] = False

        info = self.run_ba(cfg.final_ba_iters)
        self.wash_outliers()
        self.run_ba(cfg.step_ba_iters)
        self.log.append(
            f"final: {self.n_registered}/{self.V} views, "
            f"{int(self.point_active.sum())} points, cost {float(info['final_cost']):.1f}"
        )
        self.progress("reconstruction", 1.0)
        return self.to_scene()

    def to_scene(self) -> Scene:
        sc = empty_scene(self.V, len(self.points), self.O)
        return sc.replace(
            intr=jnp.asarray(self.intr),
            cam_rot=jnp.asarray(self.aa),
            cam_t=jnp.asarray(self.t),
            cam_mask=jnp.asarray(self.registered),
            points=jnp.asarray(self.points),
            point_mask=jnp.asarray(self.point_active),
            obs_cam=jnp.asarray(self.obs_cam),
            obs_pt=jnp.asarray(self.obs_pt),
            obs_uv=jnp.asarray(self.obs_uv),
            obs_mask=jnp.asarray(self._obs_mask()),
        )

    def colorize(self, scene: Scene, images: np.ndarray) -> Scene:
        """Mean track color (parity: ColorizeTracks, sparseBuilder.cpp:1620).
        images: (V, H, W, 3) uint8."""
        images = np.asarray(images)
        mask = np.asarray(scene.obs_mask)
        acc = np.zeros((len(self.points), 3), np.float64)
        cnt = np.zeros(len(self.points), np.int64)
        uv = np.clip(
            self.obs_uv.astype(int),
            0,
            [images.shape[2] - 1, images.shape[1] - 1],
        )
        for o in np.nonzero(mask)[0]:
            acc[self.obs_pt[o]] += images[self.obs_cam[o], uv[o, 1], uv[o, 0]]
            cnt[self.obs_pt[o]] += 1
        colors = (acc / np.maximum(cnt[:, None], 1)).astype(np.uint8)
        return scene.replace(colors=jnp.asarray(colors))
