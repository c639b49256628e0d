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
