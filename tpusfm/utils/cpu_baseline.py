"""Measured CPU reference baseline for bench.py.

The reference (RainbowXXX/3DReconstruction) publishes no numbers and its
C++ stack (OpenMVG + OpenCV + Ceres + OpenMVS) is not buildable in this
image, so the baseline is MEASURED by running an equivalent CPU pipeline on
the same synthetic scenes, stage for stage:

  reference stage                       CPU-baseline stand-in
  -----------------------------------   ----------------------------------
  vlfeat SIFT (detectFeature)           cv2.SIFT_create (same algorithm
                                        family; reference SIFT_describer
                                        defaults: 6 octaves, peak .04,
                                        edge 10 — cv2 defaults match)
  cascade-hash L2 ratio 0.8 (match)     cv2.BFMatcher knn ratio 0.8
                                        (exact L2 — cascade hashing
                                        approximates this FASTER, so BF is
                                        generous to us; both exhaustive)
  F-matrix AC-RANSAC 4px (filter)       cv2.findFundamentalMat RANSAC 4px
  incremental engine (reconstruction)   E-matrix init + solvePnPRansac
                                        (8px, SequentialActuator.h:176) +
                                        cv2.triangulatePoints
  Ceres SPARSE_SCHUR BA 1 thread        scipy.optimize.least_squares TRF,
  (BundleAdjuster.h:167-174)            sparse jacobian, huber f_scale=4
                                        (BundleAdjuster.h:109)

All heavy kernels are C/C++ (OpenCV, scipy) — this is a real CPU pipeline,
not interpreted Python.  Used by bench.py to produce a *measured*
vs_baseline; the result is recorded in BASELINE_MEASURED.json.
"""

from __future__ import annotations

import time

import numpy as np


def run_cpu_baseline(images: np.ndarray, intr: np.ndarray, ba: bool = True,
                     log=lambda *a: None) -> dict:
    """Run the CPU reference pipeline on (V, H, W) grayscale float images in
    [0, 1].  intr: (7,) [fx, fy, cx, cy, k1, k2, k3] shared.
    Returns {'fps', 'total_s', 'times_s': {...}, 'n_registered', 'centers'}."""
    import cv2

    V = images.shape[0]
    u8 = (np.clip(np.asarray(images), 0, 1) * 255).astype(np.uint8)
    K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1]],
                 np.float64)
    times = {}
    t_all = time.time()

    # --- features (detectFeature parity) -----------------------------------
    t0 = time.time()
    sift = cv2.SIFT_create()
    kps, descs = [], []
    for v in range(V):
        kp, de = sift.detectAndCompute(u8[v], None)
        kps.append(np.asarray([k.pt for k in kp], np.float64).reshape(-1, 2))
        descs.append(de if de is not None else np.zeros((0, 128), np.float32))
    times["features"] = time.time() - t0
    log(f"cpu-baseline: SIFT {sum(len(k) for k in kps)} kps in {times['features']:.2f}s")

    # --- exhaustive ratio matching (match parity) ---------------------------
    t0 = time.time()
    bf = cv2.BFMatcher(cv2.NORM_L2)
    pair_matches = {}
    for i in range(V):
        for j in range(i + 1, V):
            if len(descs[i]) < 8 or len(descs[j]) < 8:
                continue
            knn = bf.knnMatch(descs[i], descs[j], k=2)
            good = [m for m, n in (p for p in knn if len(p) == 2)
                    if m.distance < 0.8 * n.distance]
            if len(good) >= 8:
                pair_matches[(i, j)] = np.asarray(
                    [(m.queryIdx, m.trainIdx) for m in good], np.int32)
    times["matching"] = time.time() - t0

    # --- geometric filter (filter parity: F-RANSAC 4px, >=50 kept) ----------
    t0 = time.time()
    filtered = {}
    for (i, j), m in pair_matches.items():
        p0 = kps[i][m[:, 0]]
        p1 = kps[j][m[:, 1]]
        F, inl = cv2.findFundamentalMat(p0, p1, cv2.FM_RANSAC, 4.0, 0.99)
        if F is None or inl is None:
            continue
        inl = inl.ravel().astype(bool)
        if inl.sum() >= 50:  # sparseBuilder.cpp:1204
            filtered[(i, j)] = m[inl]
    times["filtering"] = time.time() - t0
    log(f"cpu-baseline: {len(filtered)} pairs survive filtering")

    # --- incremental reconstruction (SequentialActuator parity) -------------
    t0 = time.time()
    # Union-find tracks over filtered matches.
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (i, j), m in filtered.items():
        for a, b in m:
            ra, rb = find((i, int(a))), find((j, int(b)))
            if ra != rb:
                parent[ra] = rb
    track_of = {}
    tracks = {}
    for key in list(parent):
        r = find(key)
        tid = track_of.setdefault(r, len(track_of))
        tracks.setdefault(tid, []).append(key)

    # Init pair: most filtered matches.
    if not filtered:
        return dict(fps=0.0, total_s=time.time() - t_all, times_s=times,
                    n_registered=0, centers=np.zeros((0, 3)))
    (i0, j0), m0 = max(filtered.items(), key=lambda kv: len(kv[1]))
    p0 = kps[i0][m0[:, 0]]
    p1 = kps[j0][m0[:, 1]]
    E, inl = cv2.findEssentialMat(p0, p1, K, cv2.RANSAC, 0.999, 4.0)
    inl = inl.ravel().astype(bool)
    _, R1, t1, _ = cv2.recoverPose(E, p0[inl], p1[inl], K)
    poses = {i0: (np.eye(3), np.zeros(3)), j0: (R1, t1.ravel())}

    def triangulate(i, j, pi, pj):
        Ri, ti = poses[i]
        Rj, tj = poses[j]
        Pi = K @ np.hstack([Ri, ti.reshape(3, 1)])
        Pj = K @ np.hstack([Rj, tj.reshape(3, 1)])
        X = cv2.triangulatePoints(Pi, Pj, pi.T, pj.T)
        return (X[:3] / np.where(np.abs(X[3]) < 1e-12, 1e-12, X[3])).T

    # World points per track id.
    world = {}
    obs = {}  # track -> list[(view, uv)]
    for (i, j), m in filtered.items():
        for a, b in m:
            tid = track_of.get(find((i, int(a))))
            if tid is None:
                continue
            obs.setdefault(tid, {})[i] = kps[i][a]
            obs[tid][j] = kps[j][b]
    X01 = triangulate(i0, j0, p0[inl], p1[inl])
    k_in = np.nonzero(inl)[0]
    for row, X in zip(k_in, X01):
        tid = track_of.get(find((i0, int(m0[row, 0]))))
        if tid is not None and X[2] > 0:
            world[tid] = X

    # Register remaining views by PnP (solvePnPRansac, 8px, like
    # SequentialActuator.h:175-196 with the <30-inlier frame drop).
    remaining = [v for v in range(V) if v not in poses]
    progressed = True
    while progressed and remaining:
        progressed = False
        for v in list(remaining):
            pts3, pts2 = [], []
            for tid, X in world.items():
                uv = obs.get(tid, {}).get(v)
                if uv is not None:
                    pts3.append(X)
                    pts2.append(uv)
            if len(pts3) < 6:
                continue
            ok, rvec, tvec, inliers = cv2.solvePnPRansac(
                np.asarray(pts3), np.asarray(pts2), K, None,
                reprojectionError=8.0, iterationsCount=100, confidence=0.99)
            if not ok or inliers is None or len(inliers) < 30:
                continue
            R, _ = cv2.Rodrigues(rvec)
            poses[v] = (R, tvec.ravel())
            remaining.remove(v)
            progressed = True
            # Triangulate new tracks seen by this view + a registered one.
            for tid, vs in obs.items():
                if tid in world or v not in vs:
                    continue
                for u in vs:
                    if u in poses and u != v:
                        X = triangulate(u, v, vs[u].reshape(1, 2),
                                        vs[v].reshape(1, 2))[0]
                        if X[2] > 0:
                            world[tid] = X
                        break
    times["reconstruction"] = time.time() - t0
    log(f"cpu-baseline: registered {len(poses)}/{V} views, {len(world)} points")

    # --- bundle adjustment (Ceres SPARSE_SCHUR stand-in) --------------------
    if ba and len(world) > 10:
        t0 = time.time()
        from scipy.optimize import least_squares
        from scipy.sparse import lil_matrix

        view_ids = sorted(poses)
        vidx = {v: k for k, v in enumerate(view_ids)}
        tids = sorted(world)
        tidx = {t_: k for k, t_ in enumerate(tids)}
        rows = []
        for tid in tids:
            for v, uv in obs[tid].items():
                if v in vidx:
                    rows.append((vidx[v], tidx[tid], uv))
        cam0 = np.zeros((len(view_ids), 6))
        for v, k in vidx.items():
            rv, _ = __import__("cv2").Rodrigues(poses[v][0])
            cam0[k, :3] = rv.ravel()
            cam0[k, 3:] = poses[v][1]
        X0 = np.asarray([world[t_] for t_ in tids])
        x0 = np.concatenate([cam0.ravel(), X0.ravel()])
        nC = len(view_ids)
        ocam = np.asarray([r[0] for r in rows])
        opt = np.asarray([r[1] for r in rows])
        ouv = np.asarray([r[2] for r in rows])

        def resid(x):
            import cv2 as _cv2

            cams = x[: nC * 6].reshape(nC, 6)
            pts = x[nC * 6:].reshape(-1, 3)
            out = np.zeros((len(rows), 2))
            for c in range(nC):
                sel = ocam == c
                if not sel.any():
                    continue
                rv = cams[c, :3].reshape(3, 1)
                tv = cams[c, 3:].reshape(3, 1)
                proj, _ = _cv2.projectPoints(pts[opt[sel]], rv, tv, K, None)
                out[sel] = proj.reshape(-1, 2) - ouv[sel]
            return out.ravel()

        spar = lil_matrix((2 * len(rows), len(x0)), dtype=np.int8)
        for r, (c, p, _) in enumerate(rows):
            spar[2 * r: 2 * r + 2, 6 * c: 6 * c + 6] = 1
            spar[2 * r: 2 * r + 2, nC * 6 + 3 * p: nC * 6 + 3 * p + 3] = 1
        least_squares(resid, x0, jac_sparsity=spar, method="trf",
                      loss="huber", f_scale=4.0, max_nfev=25, verbose=0)
        times["ba"] = time.time() - t0

    total = time.time() - t_all
    centers = np.asarray([-(R.T @ t) for R, t in
                          (poses[v] for v in sorted(poses))])
    return dict(fps=V / total, total_s=total, times_s={k: round(v, 3) for k, v in times.items()},
                n_registered=len(poses), centers=centers)
