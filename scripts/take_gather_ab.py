#!/usr/bin/env python
"""A/B: one-hot-matmul gather vs chunked take_along_axis gather in pallas.

Mosaic lowers jnp.take_along_axis along lanes ONLY at vreg width (128
lanes, discovered empirically: (8,128) compiles, (8,256) crashes the
backend compiler).  A wide-table gather therefore becomes, per 128-lane
output chunk: n_tab/128 x [static table slice -> take(lo) -> select on
hi] — pure VPU, no iota-compare one-hot build and no narrow MXU matmul.

This measures the bwd-phase window gather of ops/obs_table.py
schur_mv_t / schur_bwd_t at the BA bench shape (sorted ranks, 2B-wide
windows, BL=8192 obs/block, ~1.48M obs) in a 16-iteration jitted loop
(in-situ method; see PERF.md "Measurement pitfalls").

Usage: python scripts/take_gather_ab.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 512
BL = 8192
NSUB = BL // B
ITERS = 16


def _oh_dot_t(vals, onehot):
    hi, mid, lo = [], [], []
    v = vals.astype(jnp.float32)
    b = (v * (1 << 11)).astype(jnp.bfloat16)  # crude split stand-in
    dn = (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(vals.astype(jnp.bfloat16), onehot, dn,
                               preferred_element_type=jnp.float32)


def onehot_kernel(wstart_ref, rk_ref, tab_ref, out_ref):
    s = pl.program_id(0)
    rk = rk_ref[:]
    outs = []
    for kk in range(NSUB):
        base = wstart_ref[s * NSUB + kk] * B
        win = tab_ref[:, pl.ds(base, 2 * B)]        # (3, 2B)
        rk_k = rk[:, kk * B:(kk + 1) * B]
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (2 * B, B), 0)
        onehot = (rows2 == (rk_k - base)).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        outs.append(jax.lax.dot_general(win.astype(jnp.bfloat16), onehot, dn,
                                        preferred_element_type=jnp.float32))
    out_ref[:] = jnp.concatenate(outs, axis=1)


def take_kernel(wstart_ref, rk_ref, tab_ref, out_ref):
    s = pl.program_id(0)
    rk = rk_ref[:]
    outs = []
    for kk in range(NSUB):
        base = wstart_ref[s * NSUB + kk] * B
        win = tab_ref[:, pl.ds(base, 2 * B)]        # (3, 2B)
        loc = rk[:, kk * B:(kk + 1) * B] - base     # (1, B) in [0, 2B)
        chunks = []
        for c in range(B // 128):
            idx_c = loc[:, c * 128:(c + 1) * 128]   # (1, 128)
            lo = jnp.broadcast_to(idx_c & 127, (3, 128))
            hi = idx_c >> 7                          # (1, 128) in [0, 16)
            acc = jnp.zeros((3, 128), jnp.float32)
            for j in range(2 * B // 128):
                tab_j = win[:, j * 128:(j + 1) * 128]
                g = jnp.take_along_axis(tab_j, lo, axis=1)
                acc = jnp.where(hi == j, g, acc)
            chunks.append(acc)
        outs.append(jnp.concatenate(chunks, axis=1))
    out_ref[:] = jnp.concatenate(outs, axis=1)


def run(name, kernel, wstart, rk, tab, o_p, p_tab):
    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(o_p // BL,),
            in_specs=[
                pl.BlockSpec((1, BL), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, p_tab), lambda s, ws: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3, BL), lambda s, ws: (0, s),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((3, o_p), jnp.float32),
    )

    @jax.jit
    def loop(ws, rk, tab):
        def body(i, acc):
            out = f(ws, rk, tab + acc * 1e-20)
            return acc + out[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    out = loop(wstart, rk, tab)
    _ = float(np.asarray(out))
    t0 = time.time()
    out = loop(wstart, rk, tab)
    _ = float(np.asarray(out))
    dt = (time.time() - t0) / ITERS
    print(f"{name:24s} {dt*1e3:8.3f} ms/pass", flush=True)
    return f


def main():
    O = 1_480_000
    P = 49_000
    o_p = (O + BL - 1) // BL * BL
    p_tab = (P + B - 1) // B * B + B
    r = np.random.default_rng(0)
    ranks = np.sort(r.integers(0, P, size=O)).astype(np.int32)
    # dense relabel
    u, inv = np.unique(ranks, return_inverse=True)
    ranks = inv.astype(np.int32)
    p = int(ranks.max()) + 1
    ranks_p = np.pad(ranks.reshape(1, -1), ((0, 0), (0, o_p - O)),
                     constant_values=p_tab - B)
    wstart = np.minimum(ranks_p[0, ::B] // B, p_tab // B - 2).astype(np.int32)
    tab = r.normal(size=(3, p_tab)).astype(np.float32)

    wstart = jnp.asarray(wstart)
    rk = jnp.asarray(ranks_p)
    tab = jnp.asarray(tab)

    # correctness
    fa = run("onehot_matmul", onehot_kernel, wstart, rk, tab, o_p, p_tab)
    fb = run("chunked_take", take_kernel, wstart, rk, tab, o_p, p_tab)
    a = np.asarray(fa(wstart, rk, tab))[:, :O]
    b = np.asarray(fb(wstart, rk, tab))[:, :O]
    ref = np.asarray(tab)[:, ranks]
    print("onehot max err:", np.abs(a - ref).max())
    print("take   max err:", np.abs(b - ref).max())


if __name__ == "__main__":
    main()


# ---- v2: span-exploiting variants (dense sorted ranks: span<=127/chunk) ----

def take_span_kernel(wstart_ref, rk_ref, tab_ref, out_ref):
    s = pl.program_id(0)
    rk = rk_ref[:]
    outs = []
    for kk in range(NSUB):
        base = wstart_ref[s * NSUB + kk] * B
        loc = rk[:, kk * B:(kk + 1) * B] - base     # (1, B) in [0, 2B)
        chunks = []
        for c in range(B // 128):
            idx_c = loc[:, c * 128:(c + 1) * 128]   # (1, 128)
            j0 = jnp.minimum(jnp.min(idx_c) >> 7, (2 * B - 256) // 128)
            lo = jnp.broadcast_to(idx_c & 127, (3, 128))
            hi = idx_c >> 7
            t0 = tab_ref[:, pl.ds(base + j0 * 128, 128)]
            t1 = tab_ref[:, pl.ds(base + j0 * 128 + 128, 128)]
            g0 = jnp.take_along_axis(t0, lo, axis=1)
            g1 = jnp.take_along_axis(t1, lo, axis=1)
            acc = jnp.where(hi == j0, g0, jnp.where(hi == j0 + 1, g1, 0.0))
            chunks.append(acc)
        outs.append(jnp.concatenate(chunks, axis=1))
    out_ref[:] = jnp.concatenate(outs, axis=1)


def _split3(v):
    b1 = v.astype(jnp.bfloat16)
    r1 = (v - b1.astype(jnp.float32))
    b2 = r1.astype(jnp.bfloat16)
    b3 = (r1 - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    return b1, b2, b3


def _oh_dot_tt(vals, onehot):
    hi, mid, lo = _split3(vals)
    dn = (((1,), (1,)), ((), ()))

    def d(v):
        return jax.lax.dot_general(v, onehot, dn,
                                   preferred_element_type=jnp.float32)
    return d(hi) + d(mid) + d(lo)


def scatter_onehot_kernel(wstart_ref, rk_ref, vals_ref, out_ref):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    rk = rk_ref[:]
    for kk in range(NSUB):
        base = wstart_ref[s * NSUB + kk] * B
        rk_k = rk[:, kk * B:(kk + 1) * B]
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (2 * B, B), 0)
        onehot = (rows2 == (rk_k - base)).astype(jnp.bfloat16)
        out_ref[:, pl.ds(base, 2 * B)] += _oh_dot_tt(
            vals_ref[:, kk * B:(kk + 1) * B], onehot)


def scatter_span_kernel(wstart_ref, rk_ref, vals_ref, out_ref):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    rk = rk_ref[:]
    for kk in range(NSUB):
        base = wstart_ref[s * NSUB + kk] * B
        loc = rk[:, kk * B:(kk + 1) * B] - base
        for c in range(B // 128):
            idx_c = loc[:, c * 128:(c + 1) * 128]
            j0 = jnp.minimum(jnp.min(idx_c) >> 7, (2 * B - 256) // 128)
            rows2 = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
            onehot = (rows2 == (idx_c - j0 * 128)).astype(jnp.bfloat16)
            out_ref[:, pl.ds(base + j0 * 128, 256)] += _oh_dot_tt(
                vals_ref[:, kk * B + c * 128:kk * B + (c + 1) * 128], onehot)


def run_scatter(name, kernel, wstart, rk, vals, o_p, p_tab):
    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(o_p // BL,),
            in_specs=[
                pl.BlockSpec((1, BL), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, BL), lambda s, ws: (0, s),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3, p_tab), lambda s, ws: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((3, p_tab), jnp.float32),
    )

    @jax.jit
    def loop(ws, rk, vals):
        def body(i, acc):
            out = f(ws, rk, vals + acc * 1e-20)
            return acc + out[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    out = loop(wstart, rk, vals)
    _ = float(np.asarray(out))
    t0 = time.time()
    out = loop(wstart, rk, vals)
    _ = float(np.asarray(out))
    dt = (time.time() - t0) / ITERS
    print(f"{name:24s} {dt*1e3:8.3f} ms/pass", flush=True)
    return f


def main2():
    O = 1_480_000
    P = 49_000
    o_p = (O + BL - 1) // BL * BL
    p_tab = (P + B - 1) // B * B + B
    r = np.random.default_rng(0)
    ranks = np.sort(r.integers(0, P, size=O)).astype(np.int32)
    u, inv = np.unique(ranks, return_inverse=True)
    ranks = inv.astype(np.int32)
    p = int(ranks.max()) + 1
    ranks_p = np.pad(ranks.reshape(1, -1), ((0, 0), (0, o_p - O)),
                     constant_values=p_tab - B)
    wstart = np.minimum(ranks_p[0, ::B] // B, p_tab // B - 2).astype(np.int32)
    tab = r.normal(size=(3, p_tab)).astype(np.float32)
    vals = r.normal(size=(3, o_p)).astype(np.float32)
    wstart_j = jnp.asarray(wstart); rk_j = jnp.asarray(ranks_p)
    tab_j = jnp.asarray(tab); vals_j = jnp.asarray(vals)

    fv2 = run("take_span", take_span_kernel, wstart_j, rk_j, tab_j, o_p, p_tab)
    b = np.asarray(fv2(wstart_j, rk_j, tab_j))[:, :O]
    print("take_span max err:", np.abs(b - tab[:, ranks]).max())

    fa = run_scatter("scatter_onehot", scatter_onehot_kernel, wstart_j, rk_j,
                     vals_j, o_p, p_tab)
    fb = run_scatter("scatter_span", scatter_span_kernel, wstart_j, rk_j,
                     vals_j, o_p, p_tab)
    ya = np.asarray(fa(wstart_j, rk_j, vals_j))
    yb = np.asarray(fb(wstart_j, rk_j, vals_j))
    ref = np.zeros((3, p_tab), np.float32)
    np.add.at(ref, (slice(None), ranks), vals[:, :O])
    print("scatter_onehot max err:", np.abs(ya - ref).max())
    print("scatter_span   max err:", np.abs(yb - ref).max())


if __name__ == "__main__":
    main2()


def gather_span_kernel(wstart_ref, rk_ref, tab_ref, out_ref):
    """Per-128-chunk (256,128) one-hot gather: dense sorted ranks span
    <=127 per chunk, so a 2-vreg aligned window covers every index."""
    s = pl.program_id(0)
    rk = rk_ref[:]
    outs = []
    for kk in range(NSUB):
        base = wstart_ref[s * NSUB + kk] * B
        loc = rk[:, kk * B:(kk + 1) * B] - base
        chunks = []
        for c in range(B // 128):
            idx_c = loc[:, c * 128:(c + 1) * 128]
            j0 = jnp.minimum(jnp.min(idx_c) >> 7, (2 * B - 256) // 128)
            win = tab_ref[:, pl.ds(base + j0 * 128, 256)]   # (3, 256)
            rows2 = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
            onehot = (rows2 == (idx_c - j0 * 128)).astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            chunks.append(jax.lax.dot_general(
                win.astype(jnp.bfloat16), onehot, dn,
                preferred_element_type=jnp.float32))
        outs.append(jnp.concatenate(chunks, axis=1))
    out_ref[:] = jnp.concatenate(outs, axis=1)


def main3():
    O = 1_480_000
    P = 49_000
    o_p = (O + BL - 1) // BL * BL
    p_tab = (P + B - 1) // B * B + B
    r = np.random.default_rng(0)
    ranks = np.sort(r.integers(0, P, size=O)).astype(np.int32)
    u, inv = np.unique(ranks, return_inverse=True)
    ranks = inv.astype(np.int32)
    ranks_p = np.pad(ranks.reshape(1, -1), ((0, 0), (0, o_p - O)),
                     constant_values=p_tab - B)
    wstart = np.minimum(ranks_p[0, ::B] // B, p_tab // B - 2).astype(np.int32)
    tab = r.normal(size=(3, p_tab)).astype(np.float32)
    wstart_j = jnp.asarray(wstart); rk_j = jnp.asarray(ranks_p)
    tab_j = jnp.asarray(tab)
    fg = run("gather_span", gather_span_kernel, wstart_j, rk_j, tab_j,
             o_p, p_tab)
    b = np.asarray(fg(wstart_j, rk_j, tab_j))[:, :O]
    err = np.abs(b - np.asarray(tab)[:, ranks]).max()
    print("gather_span max err (bf16 rounding expected):", err)


main3()
