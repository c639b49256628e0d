#!/usr/bin/env python
"""In-situ TPU gather-rate ablation (round 4, verdict item 1).

PERF.md round 3 claims dense PatchMatch is floored by "~70M XLA random
gathers/s".  This measures every candidate sampling primitive inside ONE
jitted 16-iteration loop (the only valid timing under the ~25 ms tunnel
dispatch floor) and prints effective rates.

Round-4 findings (TPU v5e via axon, jax 0.9):
  adv2d_bilinear   22 M bilinear samples/s  (4 advanced-index gathers each,
                   88 M gathers/s)
  adv2d_nearest    95 M samples/s   (1 gather)
  flat1d nearest  133 M samples/s   (1 gather, flat index)  -> 6x bilinear
  gather22        lax.gather slice_sizes=(2,2) CRASHES the TPU worker
                   (kernel fault) — never use slabbed gathers on this backend
  pallas axis=0   take_along_axis(axis=0) does not lower in Mosaic
                   (sublane dynamic gather unsupported; lowering assert)
  tala_lane / pallas_lane: see run output — the lane (minor-dim row-local)
                   dynamic gather path.

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
        print(f"{name:22s} {dt*1e3:9.1f} ms  {rate/1e6:10.1f} M samples/s",
              flush=True)
        return rate
    except Exception as e:
        lines = str(e).splitlines() or [repr(e)]
        print(f"{name:22s} FAILED: {type(e).__name__}: {lines[0][:160]}",
              flush=True)
        return None


def loop(body, iters=ITERS):
    def run(img, vv, uu):
        def it(i, acc):
            return acc + body(img, vv + acc * 1e-30, uu)

        return jax.lax.fori_loop(0, iters, it, jnp.float32(0.0))

    return run


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    vv = jnp.asarray(rng.uniform(0, H - 2, size=NS).astype(np.float32))
    uu = jnp.asarray(rng.uniform(0, W - 2, size=NS).astype(np.float32))

    def flat1d(img, vv, uu):
        fimg = img.reshape(-1)
        v0 = jnp.clip(jnp.round(vv).astype(jnp.int32), 0, H - 1)
        u0 = jnp.clip(jnp.round(uu).astype(jnp.int32), 0, W - 1)
        return jnp.sum(fimg[v0 * W + u0]) * 1e-30

    def flat1d_bilinear(img, vv, uu):
        fimg = img.reshape(-1)
        v0 = jnp.clip(jnp.floor(vv).astype(jnp.int32), 0, H - 2)
        u0 = jnp.clip(jnp.floor(uu).astype(jnp.int32), 0, W - 2)
        fv = vv - v0
        fu = uu - u0
        base = v0 * W + u0
        a = fimg[base]
        b = fimg[base + 1]
        c = fimg[base + W]
        d = fimg[base + W + 1]
        s = a * (1 - fv) * (1 - fu) + b * (1 - fv) * fu + c * fv * (1 - fu) + d * fv * fu
        return jnp.sum(s) * 1e-30

    def flat1d_lerp2(img, vv, uu):
        # 2-gather bilinear: horizontal lerp from a row-pair image built
        # once (vlerp done by gathering from img and img shifted one row,
        # interleaved) — here: gather (v0,u) from A=img and B=roll(img,-1)
        # then vertical lerp. 2 gathers + build cost amortized over uses.
        A = img.reshape(-1)
        B = jnp.roll(img, -1, axis=0).reshape(-1)
        v0 = jnp.clip(jnp.floor(vv).astype(jnp.int32), 0, H - 2)
        u0 = jnp.clip(jnp.round(uu).astype(jnp.int32), 0, W - 1)
        fv = vv - v0
        base = v0 * W + u0
        return jnp.sum(A[base] * (1 - fv) + B[base] * fv) * 1e-30

    bench("flat1d_nearest", loop(flat1d), img, vv, uu)
    bench("flat1d_bilinear", loop(flat1d_bilinear), img, vv, uu,
          n_samples=NS * 4)
    bench("flat1d_lerp2(vert)", loop(flat1d_lerp2), img, vv, uu,
          n_samples=NS * 2)

    # dtype effect
    imgb = img.astype(jnp.bfloat16)

    def flat1d_bf16(img, vv, uu):
        fimg = img.reshape(-1)
        v0 = jnp.clip(jnp.round(vv).astype(jnp.int32), 0, H - 1)
        u0 = jnp.clip(jnp.round(uu).astype(jnp.int32), 0, W - 1)
        return jnp.sum(fimg[v0 * W + u0].astype(jnp.float32)) * 1e-30

    bench("flat1d_nearest_bf16", loop(flat1d_bf16), imgb, vv, uu)

    # gather batch-size effect (one gather op per iteration, varying size)
    for frac, tag in ((8, "512k"), (1, "4M")):
        n = NS // frac

        def flat_n(img, vv, uu, n=n):
            fimg = img.reshape(-1)
            v0 = jnp.clip(jnp.round(vv[:n]).astype(jnp.int32), 0, H - 1)
            u0 = jnp.clip(jnp.round(uu[:n]).astype(jnp.int32), 0, W - 1)
            return jnp.sum(fimg[v0 * W + u0]) * 1e-30

        bench(f"flat1d_batch_{tag}", loop(flat_n, iters=ITERS * frac),
              img, vv, uu, n_samples=n, iters=ITERS * frac)

    # sorted (coherent) indices: same gather, ascending order
    vs = jnp.sort(vv)

    def flat_sorted(img, vv, uu):
        fimg = img.reshape(-1)
        v0 = jnp.clip(jnp.round(vv).astype(jnp.int32), 0, H - 1)
        u0 = jnp.clip(jnp.round(uu).astype(jnp.int32), 0, W - 1)
        return jnp.sum(fimg[v0 * W + u0]) * 1e-30

    bench("flat1d_sorted_v", loop(flat_sorted), img, vs, uu)

    # XLA take_along_axis along the minor dim (row-local lane gather)
    NS_ROWS = NS // W

    def tala_lane(img, vv, uu):
        u = jnp.clip(jnp.round(uu[: NS_ROWS * W]).astype(jnp.int32), 0, W - 1)
        u = u.reshape(NS_ROWS, W)
        rows = jnp.tile(img, (NS_ROWS // H + 1, 1))[:NS_ROWS]
        return jnp.sum(jnp.take_along_axis(rows, u, axis=1)) * 1e-30

    bench("tala_lane(XLA)", loop(tala_lane), img, vv, uu)

    # ---- Pallas: in-kernel lane gather over VMEM-resident rows ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS = NS_ROWS

    def pallas_lane_kernel(img_ref, u_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(img_ref[:], u_ref[:], axis=1)

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


if __name__ == "__main__":
    main()
