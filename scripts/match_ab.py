#!/usr/bin/env python
"""In-situ matcher-kernel throughput (round-3/4 harness): a 16-iteration
jitted loop over a cross-checked 32-pair x 1024x1024x128 chunk — the r03
kernel measured 2.07 ms/chunk = 8.3 TFLOP/s effective here (PERF.md);
round-4 target is > 20 TFLOP/s (verdict item 7).

FLOP accounting matches r03: 2 * Na * Nb * D per direction, 2 directions
(cross-check), 32 pairs.

Usage: python scripts/match_ab.py [cpu] [f32]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

if "cpu" in sys.argv[1:]:
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

PAIRS, N, D = 32, 1024, 128
ITERS = 16


def main():
    quantized = "f32" not in sys.argv[1:]
    from tpusfm.ops import pallas_match

    rng = np.random.default_rng(0)
    # u8-grid descriptors (the production distribution).
    da = jnp.asarray(
        rng.integers(0, 256, size=(PAIRS, N, D)).astype(np.float32))
    db = jnp.asarray(
        rng.integers(0, 256, size=(PAIRS, N, D)).astype(np.float32))
    ma = jnp.ones((PAIRS, N), bool)
    mb = jnp.ones((PAIRS, N), bool)

    @jax.jit
    def run(da, db):
        def chunk(x):
            i1, ok = jax.vmap(
                lambda a, b, m_a, m_b: pallas_match.match_descriptors_pallas(
                    a, b, m_a, m_b, quantized=quantized)
            )(da + x, db, ma, mb)
            return jnp.sum(ok.astype(jnp.float32)) + i1[0, 0] * 1e-30

        def it(i, acc):
            return acc + chunk(acc * 1e-30) * 1e-30

        return jax.lax.fori_loop(0, ITERS, it, jnp.float32(0.0))

    out = run(da, db)
    _ = float(np.asarray(out))
    t0 = time.time()
    out = run(da, db)
    _ = float(np.asarray(out))
    dt = time.time() - t0
    flops = 2 * 2 * PAIRS * N * N * D * ITERS  # both cross-check directions
    per_chunk_ms = dt / ITERS * 1e3
    print(f"quantized={quantized}: {per_chunk_ms:.2f} ms/chunk "
          f"{flops/dt/1e12:.1f} TFLOP/s  (r03: 2.07 ms, 8.3 TFLOP/s)")


if __name__ == "__main__":
    main()
