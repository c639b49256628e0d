"""In-situ component ablation of the BA LM iteration: stub out one piece at
a time (zeros of the right shape/dtype) and measure the whole-solve delta.
Standalone micro-timing is invalid here — every dispatch through the axon
tunnel costs ~26 ms, so only whole-solve deltas are trustworthy."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from tpusfm.utils import compile_cache
    compile_cache.enable()
    from synth import orbit_scene
    from tpusfm.ba import bundle_adjust as ba
    from tpusfm.ops import obs_table as ot

    C, P = 500, 50000
    s = orbit_scene(n_cams=C, n_points=P, noise_px=0.5, seed=3, arc_deg=350.0,
                    vis_prob=0.06)
    O = len(s["obs_cam"])
    r = np.random.default_rng(0)
    args = dict(
        intr=jnp.asarray(np.tile(s["intr"], (C, 1))),
        cam_rot=jnp.asarray(s["aa"] + r.normal(scale=0.01, size=(C, 3)),
                            dtype=jnp.float32),
        cam_t=jnp.asarray(s["t"] + r.normal(scale=0.01, size=(C, 3)),
                          dtype=jnp.float32),
        cam_mask=jnp.ones(C, bool),
        points=jnp.asarray(s["points"] + r.normal(scale=0.02, size=(P, 3)),
                           dtype=jnp.float32),
        point_mask=jnp.asarray(s["point_valid"]),
        obs_cam=jnp.asarray(s["obs_cam"]), obs_pt=jnp.asarray(s["obs_pt"]),
        obs_uv=jnp.asarray(s["obs_uv"]), obs_mask=jnp.ones(O, bool),
    )
    cfg = ba.BAConfig(max_iters=4, cg_iters=1, cg_tol=0.0, converge_rtol=0.0)

    orig = dict(linearize=ot.linearize_radial3, segsorted=ot.segsum_sorted,
                segtable=ot.segsum_table, fwd=ot.schur_fwd, bwd=ot.schur_bwd,
                pcg=ba._pcg, inv3=ba._inv3, invD=ba._invD)

    def timed(label):
        out = ba.bundle_adjust(cfg=cfg, **args)
        _ = np.asarray(out[3][:1])
        ts = []
        for _i in range(3):
            t0 = time.time()
            out = ba.bundle_adjust(cfg=cfg, **args)
            _ = np.asarray(out[3][:1])
            ts.append(time.time() - t0)
        ms = np.median(ts) / 4 * 1000
        log(f"{label:28s} {ms:7.1f} ms/LM-iter")
        return ms

    base = timed("full")

    def restore():
        ot.linearize_radial3 = orig["linearize"]
        ot.segsum_sorted = orig["segsorted"]
        ot.segsum_table = orig["segtable"]
        ot.schur_fwd = orig["fwd"]
        ot.schur_bwd = orig["bwd"]
        ba._pcg = orig["pcg"]
        ba._inv3 = orig["inv3"]
        ba._invD = orig["invD"]

    def ablate(label, **patches):
        restore()
        for k, v in patches.items():
            setattr(ot if k in ("linearize_radial3", "segsum_sorted",
                                "segsum_table", "schur_fwd", "schur_bwd")
                    else ba, k, v)
        ms = timed(label)
        restore()
        log(f"  -> delta {base - ms:+7.1f} ms")

    def lin_stub(camtab, grptab, pts_rank, obs_cam, obs_grp, ranks, obs_uv,
                 obs_w, refine, refine_mask, huber_delta, interpret=False,
                 w_dtype="f32"):
        o = ranks.shape[0]
        wdt = jnp.bfloat16 if w_dtype == "bf16" else jnp.float32
        cam_w = 85 if refine else 43
        z = camtab[0, 0] * 0
        outs = [jnp.full((o, cam_w), z), jnp.full((o, 12), z),
                jnp.full((o, 18), z, dtype=wdt)]
        if refine:
            outs += [jnp.full((o, 56), z), jnp.full((o, 21), z, dtype=wdt)]
        return tuple(outs)

    ablate("no linearize", linearize_radial3=lin_stub)
    ablate("no pt_reduce", segsum_sorted=lambda vals, ranks, p, **kw:
           jnp.zeros((p, vals.shape[1])) + vals[0, 0] * 0)
    ablate("no cam_reduce", segsum_table=lambda vals, idx, n, **kw:
           jnp.zeros((n, vals.shape[1])) + vals[0, 0] * 0)
    ablate("no schur_fwd", schur_fwd=lambda w_flat, obs_cam, ranks, vtab, p,
           **kw: jnp.zeros((p, 3)) + vtab[0, 0] * 0 +
           w_flat[0, 0].astype(jnp.float32) * 0)
    ablate("no schur_bwd", schur_bwd=lambda w_flat, obs_cam, ranks, ztab, n,
           **kw: jnp.zeros((n, w_flat.shape[1] // 3)) + ztab[0, 0] * 0 +
           w_flat[0, 0].astype(jnp.float32) * 0)
    ablate("no pcg", _pcg=lambda mv, b, M, iters, tol: b)
    ablate("no inv3", _inv3=lambda M: M)
    ablate("no invD", _invD=lambda M: M)


if __name__ == "__main__":
    main()
