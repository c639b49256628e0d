#!/usr/bin/env bash
# CI entry point.
#
#   ./ci.sh          fast suite (every commit): full tests/ on the virtual
#                    8-device CPU mesh + the multichip dryrun compile check
#   ./ci.sh nightly  adds the slow scale ladder (TPUSFM_SLOW gated medium/
#                    pod-scale tests) and the small-preset benchmark
#
# The reference ships zero tests (SURVEY.md §4); this pyramid is the
# framework's own contract — keep it green.
set -euo pipefail
cd "$(dirname "$0")"

echo "== fast suite =="
python -m pytest tests/ -x -q

echo "== multichip dryrun (8 virtual devices) =="
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

if [[ "${1:-}" == "nightly" ]]; then
    echo "== slow scale ladder =="
    TPUSFM_SLOW=1 python -m pytest tests/test_medium_scale.py tests/test_pod_scale.py -q
    echo "== native TSAN (ingest worker pool) =="
    ./native/build_tsan.sh
    echo "== on-chip fused-kernel parity (required for ops/obs_table.py changes) =="
    # Interpret mode delegates the fused T-layout kernels to compositions of
    # the sublane kernels (lane-dim dynamic ref slices don't lower there), so
    # the REAL kernel bodies are only exercised on hardware — this check is
    # the pre-merge gate for ops/obs_table.py kernel changes (ADVICE r04).
    if python -c "import jax; assert jax.default_backend() != 'cpu'" 2>/dev/null; then
        python scripts/ba_fused_check.py
    else
        echo "(skipped: no accelerator backend)"
    fi
    echo "== benchmark (small preset) =="
    BENCH_PRESET=small python bench.py
fi

echo "CI OK"
