"""In-situ BA solver ablation at the 500-cam bench config (fetch-forced).

Measures LM iterations/s for: cg_iters sweep (fixed-iteration, cg_tol=0) to
fit the per-CG-iteration and fixed costs; w_dtype bf16 vs f32; precond
schur_diag vs hcc; and the bench-style adaptive run.  Run on the real chip.

Usage: python scripts/ba_ablate.py [small]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    small = len(sys.argv) > 1 and sys.argv[1] == "small"
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tpusfm.utils import compile_cache
    compile_cache.enable()
    from synth import orbit_scene
    from tpusfm.ba import bundle_adjust as ba

    log(f"devices: {jax.devices()}")
    C, P = (100, 8000) if small else (500, 50000)
    s = orbit_scene(n_cams=C, n_points=P, noise_px=0.5, seed=3, arc_deg=350.0,
                    vis_prob=0.12 if small else 0.06)
    O = len(s["obs_cam"])
    log(f"problem: {C} cams, {P} pts, {O} obs")
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

    def run(cfg, label):
        out = ba.bundle_adjust(cfg=cfg, **args)
        _ = np.asarray(out[3])  # compile + force
        t0 = time.time()
        out = ba.bundle_adjust(cfg=cfg, **args)
        _ = np.asarray(out[3])
        dt = time.time() - t0
        it = max(float(jax.device_get(out[4]["iterations"])), 1.0)
        log(f"{label}: {it:.0f} LM it in {dt:.2f}s -> {it/dt:.2f} it/s "
            f"({dt/it*1000:.0f} ms/it) cost "
            f"{float(out[4]['initial_cost']):.0f}->{float(out[4]['final_cost']):.0f}")
        return dt / it

    # cg_iters sweep at fixed LM iterations (per-CG-iteration cost fit).
    ms = {}
    for cg in (1, 2, 4, 8, 16):
        cfg = ba.BAConfig(max_iters=4, cg_iters=cg, cg_tol=0.0,
                          converge_rtol=0.0)
        ms[cg] = run(cfg, f"cg={cg:2d} (fixed 4 LM it, bf16 W)") * 1000
    # Linear fit ms/LM-iter = a + b * cg.
    xs = np.asarray(sorted(ms))
    ys = np.asarray([ms[x] for x in xs])
    b_fit, a_fit = np.polyfit(xs, ys, 1)
    log(f"fit: ~{a_fit:.0f} ms fixed + ~{b_fit:.1f} ms per CG iteration")

    run(ba.BAConfig(max_iters=4, cg_iters=8, cg_tol=0.0, converge_rtol=0.0,
                    w_dtype="f32"), "cg= 8 f32 W")
    run(ba.BAConfig(max_iters=4, cg_iters=8, cg_tol=0.0, converge_rtol=0.0,
                    precond="hcc"), "cg= 8 precond=hcc")
    run(ba.BAConfig(max_iters=4, cg_iters=8, cg_tol=0.0, converge_rtol=0.0,
                    fused_linearize=False), "cg= 8 unfused")

    # Bench-style adaptive runs (the recorded metric).
    s_per_it = run(ba.BAConfig(max_iters=10, cg_iters=30), "bench default")
    run(ba.BAConfig(max_iters=10, cg_iters=30, precond="hcc"),
        "bench adaptive precond=hcc")
    print(f'{{"lm_iters_per_s": {1.0/s_per_it:.2f}}}')


if __name__ == "__main__":
    main()
