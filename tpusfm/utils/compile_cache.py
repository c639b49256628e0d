"""Persistent XLA compilation cache.

The TPU backend in this deployment compiles remotely (tens of seconds to
minutes per executable through the tunnel); JAX's persistent compilation
cache makes every compiled executable a one-time cost per machine —
measured here: a 240 s first compile is a 0.1 s cache hit in a fresh
process.  The reference has no analog (its C++ is AOT-compiled); this is
the TPU-native equivalent of shipping prebuilt kernels.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def _host_fingerprint() -> str:
    """Short stable hash of this host's CPU feature flags."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    key = f"{platform.machine()}|{flags}"
    return hashlib.sha256(key.encode()).hexdigest()[:12]


def enable(cache_dir: str | None = None) -> str | None:
    """Enable the JAX persistent compilation cache (idempotent).

    Directory priority: explicit arg > $TPUSFM_COMPILE_CACHE > .jax_cache
    next to the package.  Set TPUSFM_COMPILE_CACHE=0 to disable."""
    global _enabled
    env = os.environ.get("TPUSFM_COMPILE_CACHE", "")
    if env in ("0", "off", "none"):
        return None
    d = cache_dir or env or _DEFAULT_DIR
    # Namespace by a host-CPU fingerprint: XLA:CPU caches AOT executables
    # compiled for the COMPILING machine's feature set (avx512/amx/...);
    # loading one on a host without those features SIGILLs/segfaults (the
    # cpu_aot_loader warns exactly this).  A per-fingerprint subdir makes
    # the cache safe to share across heterogeneous machines.
    d = os.path.join(d, _host_fingerprint())
    try:
        import jax

        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # Cache EVERYTHING: the default 1 s floor leaves the long tail of
        # small op-by-op programs (broadcast/concatenate/convert from
        # np<->jnp glue) uncached, and the medium rung re-compiled ~20 s of
        # them per fresh process (BENCH_r04 warm_compile_top: 24 broadcasts
        # = 8.1 s, 17 concatenates = 4.4 s, ...).  Remote compiles cost
        # ~0.3 s each even for trivial programs, so a 0-floor is strictly
        # better on this backend.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception:  # flag absent on older jax
            pass
        _enabled = True
        return d
    except Exception:  # pragma: no cover - best effort on older jax
        return None
