#!/usr/bin/env python
"""Gather ablation round 2: how general is XLA's fast take_along_axis path?

RESOLVED: the first run of this script (and gather_ab.py's tala_lane)
reported 1.05-1.8 G samples/s for take_along_axis forms — those were
HOISTING ARTIFACTS (gather indices were loop-invariant; XLA lifted the
gather out of the 16-iteration timing loop).  With truly data-dependent
indices every gather form measures ~90-135 M gathers/s: that IS the XLA
per-element gather floor on this chip.  flat-index (~130 M/s) beats 2D
advanced indexing (~88 M/s) by 1.4x; nothing beats it by more.

Usage: python scripts/gather_ab3.py [cpu]
"""
from __future__ import annotations

import sys
import time

import numpy as np

if "cpu" in sys.argv[1:]:
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

H, W = 480, 640
NS = 4 * 1024 * 1024
ITERS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(name, fn, *args, n_samples=NS, iters=ITERS):
    try:
        f = jax.jit(fn)
        out = f(*args)
        _ = float(np.asarray(out))
        t0 = time.time()
        out = f(*args)
        _ = float(np.asarray(out))
        dt = time.time() - t0
        rate = n_samples * iters / dt
        print(f"{name:26s} {dt*1e3:9.1f} ms  {rate/1e6:10.1f} M samples/s",
              flush=True)
        return rate
    except Exception as e:
        lines = str(e).splitlines() or [repr(e)]
        print(f"{name:26s} FAILED: {type(e).__name__}: {lines[0][:160]}",
              flush=True)
        return None


def loop(body, iters=ITERS):
    # CRITICAL: `idx + perturbation` must feed the body's GATHER INDICES —
    # the first version of this script passed a perturbed arg some variants
    # ignored, so their gathers were loop-invariant and XLA hoisted them out
    # of the loop, fabricating 1.2-1.8 G samples/s "fast paths" (PERF.md
    # measurement pitfall #3 in gather form).  True rates are ~90-135 M/s.
    def run(img, idx):
        def it(i, acc):
            return acc + body(img, idx + (acc * 1e-30).astype(idx.dtype))

        return jax.lax.fori_loop(0, iters, it, jnp.float32(0.0))

    return run


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))

    # Width sweep: operand (NS/Wt, Wt), indices row-local uniform.
    for wt in (640, 2560, 10240, 40960, 163840, H * W):
        rows_n = NS // wt
        tbl = jnp.asarray(rng.normal(size=(rows_n, wt)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, wt, size=(rows_n, wt)).astype(np.int32))

        def tala(tbl, idx):
            return jnp.sum(jnp.take_along_axis(tbl, idx, axis=1)) * 1e-30

        bench(f"tala_w{wt}", loop(tala), tbl, idx)

    # The real primitive: flat image as ONE row, all samples gather from it.
    flat = img.reshape(1, H * W)
    vv = rng.uniform(0, H - 2, size=NS).astype(np.float32)
    uu = rng.uniform(0, W - 2, size=NS).astype(np.float32)
    fv = jnp.asarray(vv)
    fu = jnp.asarray(uu)

    def tala_flat_nearest(flat, pert):
        v0 = jnp.clip(jnp.round(fv).astype(jnp.int32), 0, H - 1)
        u0 = jnp.clip(jnp.round(fu).astype(jnp.int32), 0, W - 1)
        idx = (v0 * W + u0 + pert).reshape(1, -1)
        return jnp.sum(jnp.take_along_axis(flat, idx, axis=1)) * 1e-30

    bench("tala_flat_nearest", loop(tala_flat_nearest), flat,
          jnp.zeros((), jnp.int32))  # pert stays 0 at runtime but is
          # data-dependent, so the gather cannot be hoisted

    def tala_flat_bilinear(flat, pert):
        v0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, H - 2)
        u0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, W - 2)
        fvv = fv - v0
        fuu = fu - u0
        base = (v0 * W + u0 + pert).reshape(1, -1)
        g = lambda off: jnp.take_along_axis(flat, base + off, axis=1)[0]
        a, b, c, d = g(0), g(1), g(W), g(W + 1)
        s = (a * (1 - fvv) * (1 - fuu) + b * (1 - fvv) * fuu
             + c * fvv * (1 - fuu) + d * fvv * fuu)
        return jnp.sum(s) * 1e-30

    bench("tala_flat_bilinear", loop(tala_flat_bilinear), flat,
          jnp.zeros((), jnp.int32), n_samples=NS * 4)

    # One fused 4-neighbour gather: indices interleaved so each bilinear
    # sample's 4 taps ride one take_along call of width 4*NS.
    def tala_flat_bilinear1(flat, pert):
        v0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, H - 2)
        u0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, W - 2)
        fvv = fv - v0
        fuu = fu - u0
        base = v0 * W + u0 + pert
        idx = jnp.stack([base, base + 1, base + W, base + W + 1],
                        axis=0).reshape(1, -1)
        gg = jnp.take_along_axis(flat, idx, axis=1).reshape(4, -1)
        s = (gg[0] * (1 - fvv) * (1 - fuu) + gg[1] * (1 - fvv) * fuu
             + gg[2] * fvv * (1 - fuu) + gg[3] * fvv * fuu)
        return jnp.sum(s) * 1e-30

    bench("tala_flat_bilinear1call", loop(tala_flat_bilinear1), flat,
          jnp.zeros((), jnp.int32), n_samples=NS * 4)


if __name__ == "__main__":
    main()
