"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pre-imports jax and registers the 'axon' TPU platform via
sitecustomize (JAX_PLATFORMS=axon), so env vars are too late — switch the
platform through jax.config before any backend is initialized.  Tests are
hermetic on CPU; the real chip is exercised by bench.py (SURVEY.md §4: the
CPU mesh is the TPU analog of a fake backend).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

from tpusfm.utils import compile_cache  # noqa: E402

compile_cache.enable()

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop live executables between test modules.

    A full-suite run accumulates ~150 tests' compiled XLA:CPU executables in
    one process; with that much live runtime state the largest program in
    the suite (the fused two-view reconstruction) segfaults inside XLA:CPU
    execution — reproducibly at the same test, while any subset of the
    suite passes.  Clearing per module keeps peak state bounded; recompiles
    are absorbed by the persistent compilation cache (disk reload, ~0.1 s)."""
    yield
    jax.clear_caches()
