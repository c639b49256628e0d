"""Micro-breakdown of the BA fixed cost: each piece timed standalone at the
500-cam bench shapes, fetch-forced, median of 5 (each call pays ~3 ms tunnel
latency — fine for 10+ ms pieces)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, *args, reps=5, label=""):
    def force(o):
        # Device-side slice FIRST, then fetch — np.asarray(x)[:1] would
        # download the whole array through the tunnel.
        return [np.asarray(x[:1]) for x in
                (o if isinstance(o, (tuple, list)) else [o])]

    out = fn(*args)
    force(out)
    ts = []
    for _i in range(reps):
        t0 = time.time()
        out = fn(*args)
        force(out)
        ts.append(time.time() - t0)
    log(f"{label:34s} {np.median(ts)*1000:8.1f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp
    from tpusfm.utils import compile_cache
    compile_cache.enable()
    from synth import orbit_scene
    from tpusfm.ba import bundle_adjust as ba
    from tpusfm.ops import obs_table as ot
    from tpusfm.core import lie

    C, P = 500, 50000
    s = orbit_scene(n_cams=C, n_points=P, noise_px=0.5, seed=3, arc_deg=350.0,
                    vis_prob=0.06)
    O = len(s["obs_cam"])
    log(f"O={O}")
    r = np.random.default_rng(0)
    pose = jnp.asarray(np.concatenate([s["aa"], s["t"]], 1), jnp.float32)
    gintr = jnp.asarray(np.tile(s["intr"], (C, 1)), jnp.float32)
    pts = jnp.asarray(s["points"], jnp.float32)
    obs_pt = jnp.asarray(s["obs_pt"])
    obs_cam_u = jnp.asarray(s["obs_cam"])
    obs_uv_u = jnp.asarray(s["obs_uv"])
    obs_w_u = jnp.ones(O, jnp.float32)

    order, ranks, rank_to_pt, rank_valid = bench(
        lambda: ot.sort_and_rank(obs_pt, obs_w_u > 0, P), label="sort_and_rank (once per solve)")
    obs_cam = obs_cam_u[order]
    obs_uv = obs_uv_u[order]
    obs_w = obs_w_u[order]
    obs_grp = obs_cam
    safe = jnp.minimum(rank_to_pt, P - 1)
    pts_rank = jnp.where(rank_valid[:, None], pts[safe], 0.0)

    R = lie.so3_exp(pose[:, :3])
    Jr = lie.so3_right_jacobian(pose[:, :3])
    camtab = jnp.concatenate([pose[:, 3:6], R.reshape(C, 9), Jr.reshape(C, 9)], 1)

    lin = bench(lambda: ot.linearize_radial3(
        camtab, gintr, pts_rank, obs_cam, obs_grp, ranks, obs_uv, obs_w,
        refine=False, refine_mask=(0.0,) * 7, huber_delta=4.0,
        w_dtype="bf16"), label="linearize_radial3")
    camvals, ptvals, wc = lin

    bench(lambda: ot.segsum_table(camvals, obs_cam, C), label="cam_reduce (43w)")
    bench(lambda: ot.segsum_sorted(ptvals, ranks, P), label="pt_reduce segsum_sorted (12w)")
    vtab = jnp.asarray(r.normal(size=(C, 6)), jnp.float32)
    bench(lambda: ot.schur_fwd(wc, obs_cam, ranks, vtab, P), label="schur_fwd")
    ztab = jnp.asarray(r.normal(size=(P, 3)), jnp.float32)
    bench(lambda: ot.schur_bwd(wc, obs_cam, ranks, ztab, C), label="schur_bwd")

    # XLA glue pieces
    Hpp = jnp.asarray(r.normal(size=(P, 3, 3)), jnp.float32)
    Hpp = Hpp @ jnp.swapaxes(Hpp, -1, -2) + 3 * jnp.eye(3)
    bench(jax.jit(ba._inv3), Hpp, label="_inv3 (P,3,3)")
    Hcc = jnp.asarray(r.normal(size=(C, 6, 6)), jnp.float32)
    Hcc = Hcc @ jnp.swapaxes(Hcc, -1, -2) + 6 * jnp.eye(6)
    bench(jax.jit(ba._invD), Hcc, label="_invD (C,6,6)")
    # precond schur_diag pieces
    Hinv = ba._inv3(Hpp)

    def precond():
        Hinv_o = jnp.where((obs_pt[order] < P)[:, None],
                           Hinv.reshape(P, 9)[obs_pt[order]], 0.0)
        Wc3 = wc.reshape(-1, 6, 3).astype(jnp.float32)
        contrib = jnp.einsum("oij,ojk,olk->oil", Wc3,
                             Hinv_o.reshape(-1, 3, 3), Wc3)
        return ot.segsum_table(contrib.reshape(-1, 36), obs_cam, C)
    bench(jax.jit(precond), label="schur_diag precond (gather+einsum+reduce)")

    def rank_scatter():
        tab_r = jnp.asarray(r.normal(size=(P, 3)), jnp.float32)
        return jnp.zeros((P, 3)).at[jnp.where(rank_valid, rank_to_pt, P)].add(
            jnp.where(rank_valid[:, None], tab_r, 0.0), mode="drop")
    bench(jax.jit(rank_scatter), label="from_rank scatter (P rows)")

    def selects():
        a = jnp.where(True, wc, wc * 0)
        b = jnp.where(True, camvals, camvals * 0)
        return a, b
    bench(jax.jit(selects), label="accept-select over W+camvals")


if __name__ == "__main__":
    main()
