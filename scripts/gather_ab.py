#!/usr/bin/env python
"""In-situ TPU gather-rate ablation (round 4, verdict item 1).

PERF.md round 3 claims dense PatchMatch is floored by "~70M XLA random
gathers/s".  The verdict demands either a Pallas kernel that beats that
rate (exploiting the spatial coherence of window samples) or proof the
rate is a hardware floor.  This script measures every candidate sampling
primitive inside ONE jitted 16..32-iteration loop (the only valid timing
method under the ~25 ms tunnel dispatch floor, PERF.md "Measurement
pitfalls") and prints samples/s for each.

Variants:
  adv2d_bilinear   current production path: 4 advanced-index gathers + lerp
  adv2d_nearest    1 advanced-index gather per sample
  flat1d           1 gather from the flattened (H*W,) image
  gather22         one lax.gather of a (2,2) slice per sample + lerp
  tala_lane        take_along_axis(axis=-1): per-row lane gather (coherent)
  pallas_lane      Pallas kernel, img row VMEM-resident, in-kernel
                   take_along_axis along lanes
  pallas_2d        Pallas kernel: sublane row-gather + lane gather (full 2D)

Usage: python scripts/gather_ab.py [cpu]
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
NS = 4 * 1024 * 1024  # samples per loop iteration
ITERS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(name, fn, *args, n_samples=NS, iters=ITERS):
    try:
        f = jax.jit(fn)
        out = f(*args)
        _ = float(np.asarray(out))  # compile + force (scalar fetch)
        t0 = time.time()
        out = f(*args)
        _ = float(np.asarray(out))
        dt = time.time() - t0
        rate = n_samples * iters / dt
        print(f"{name:18s} {dt*1e3:9.1f} ms  {rate/1e6:10.1f} M samples/s")
        return rate
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"{name:18s} FAILED: {type(e).__name__}: {msg}")
        return None


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    # float coords, random (worst case for coherence-based methods use rowmaj)
    vv = jnp.asarray(rng.uniform(0, H - 2, size=NS).astype(np.float32))
    uu = jnp.asarray(rng.uniform(0, W - 2, size=NS).astype(np.float32))

    def loop(body):
        def run(img, vv, uu):
            def it(i, acc):
                # tiny index perturbation keeps iterations data-dependent
                # without changing the access pattern
                return acc + body(img, vv + acc * 1e-30, uu)

            return jax.lax.fori_loop(0, ITERS, it, jnp.float32(0.0))

        return run

    def adv2d_bilinear(img, vv, uu):
        v0 = jnp.clip(jnp.floor(vv).astype(jnp.int32), 0, H - 2)
        u0 = jnp.clip(jnp.floor(uu).astype(jnp.int32), 0, W - 2)
        fv = vv - v0
        fu = uu - u0
        a = img[v0, u0]
        b = img[v0, u0 + 1]
        c = img[v0 + 1, u0]
        d = img[v0 + 1, u0 + 1]
        s = a * (1 - fv) * (1 - fu) + b * (1 - fv) * fu + c * fv * (1 - fu) + d * fv * fu
        return jnp.sum(s) * 1e-30

    def adv2d_nearest(img, vv, uu):
        v0 = jnp.clip(jnp.round(vv).astype(jnp.int32), 0, H - 1)
        u0 = jnp.clip(jnp.round(uu).astype(jnp.int32), 0, W - 1)
        return jnp.sum(img[v0, u0]) * 1e-30

    def flat1d(img, vv, uu):
        fimg = img.reshape(-1)
        v0 = jnp.clip(jnp.round(vv).astype(jnp.int32), 0, H - 1)
        u0 = jnp.clip(jnp.round(uu).astype(jnp.int32), 0, W - 1)
        return jnp.sum(fimg[v0 * W + u0]) * 1e-30

    def gather22(img, vv, uu):
        v0 = jnp.clip(jnp.floor(vv).astype(jnp.int32), 0, H - 2)
        u0 = jnp.clip(jnp.floor(uu).astype(jnp.int32), 0, W - 2)
        fv = (vv - v0)[:, None, None]
        fu = (uu - u0)[:, None, None]
        idx = jnp.stack([v0, u0], axis=-1)  # (NS, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        g = jax.lax.gather(img, idx, dn, slice_sizes=(2, 2),
                           mode=jax.lax.GatherScatterMode.CLIP)  # (NS,2,2)
        wy = jnp.concatenate([1 - fv, fv], axis=1)       # (NS, 2, 1)
        wx = jnp.concatenate([1 - fu, fu], axis=2)       # (NS, 1, 2)
        return jnp.sum(g * wy * wx) * 1e-30

    # Row-local gather: every sample stays in its own row (coherent case —
    # what a 1D-separable resampling pass would do).
    NS_ROWS = NS // W  # rows of W samples each

    def tala_lane(img, vv, uu):
        u = jnp.clip(jnp.round(uu[: NS_ROWS * W]).astype(jnp.int32), 0, W - 1)
        u = u.reshape(NS_ROWS, W)
        rows = jnp.tile(img, (NS_ROWS // H + 1, 1))[:NS_ROWS]
        return jnp.sum(jnp.take_along_axis(rows, u, axis=1)) * 1e-30

    for name, fn in [("adv2d_bilinear", adv2d_bilinear),
                     ("adv2d_nearest", adv2d_nearest),
                     ("flat1d", flat1d),
                     ("gather22", gather22),
                     ("tala_lane", tala_lane)]:
        ns = NS * (4 if name == "adv2d_bilinear" else 1)
        bench(name, loop(fn), img, vv, uu, n_samples=ns)

    # ---- Pallas variants ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS = NS_ROWS  # total sample rows, W samples per row

    def pallas_lane_kernel(img_ref, u_ref, out_ref):
        # Gather along lanes from a (8, W) block of replicated image rows.
        img = img_ref[:]           # (8, W) rows
        u = u_ref[:]               # (8, W) int32 in [0, W)
        out_ref[:] = jnp.take_along_axis(img, u, axis=1)

    def pallas_lane(img, vv, uu):
        u = jnp.clip(jnp.round(uu[: ROWS * W]).astype(jnp.int32), 0, W - 1)
        u = u.reshape(ROWS, W)
        rows = jnp.tile(img, (ROWS // H + 1, 1))[:ROWS]

        def body(i, acc):
            out = pl.pallas_call(
                pallas_lane_kernel,
                grid=(ROWS // 8,),
                in_specs=[
                    pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, W), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((ROWS, W), jnp.float32),
            )(rows, u + (acc * 1e-30).astype(jnp.int32))
            return acc + jnp.sum(out[:1, :1]) * 1e-30

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    bench("pallas_lane", pallas_lane, img, vv, uu)

    def pallas_2d_kernel(img_ref, v_ref, u_ref, out_ref):
        # Full 2D gather with the whole image VMEM-resident:
        # row gather along sublanes, then lane gather.
        img = img_ref[:]          # (H, W)
        v = v_ref[:]              # (8, W)
        u = u_ref[:]
        # take_along_axis axis=0: out[s, l] = img[v[s, l], l]
        rows = jnp.take_along_axis(img, v, axis=0)      # (8, W) -- needs
        out_ref[:] = jnp.take_along_axis(rows, u, axis=1)

    def pallas_2d(img, vv, uu):
        n = ROWS * W
        v = jnp.clip(jnp.round(vv[:n]).astype(jnp.int32), 0, H - 1).reshape(ROWS, W)
        u = jnp.clip(jnp.round(uu[:n]).astype(jnp.int32), 0, W - 1).reshape(ROWS, W)

        def body(i, acc):
            out = pl.pallas_call(
                pallas_2d_kernel,
                grid=(ROWS // 8,),
                in_specs=[
                    pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, W), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((ROWS, W), jnp.float32),
            )(img, v + (acc * 1e-30).astype(jnp.int32), u)
            return acc + jnp.sum(out[:1, :1]) * 1e-30

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    bench("pallas_2d", pallas_2d, img, vv, uu)


if __name__ == "__main__":
    main()
