"""Test configuration: force an 8-virtual-device CPU mesh (SURVEY.md §4.4).

Multi-host sharding logic is tested single-host by re-meshing over virtual
CPU devices; the real-TPU path is exercised by bench.py and the driver's
compile checks.
"""

import os

# NOTE: this machine's sitecustomize pre-imports jax with JAX_PLATFORMS=axon
# (the TPU tunnel), so env-var edits after interpreter start are ignored —
# jax.config.update is the reliable override. XLA_FLAGS is still read at CPU
# client creation, so setting it here works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fp32 matmuls for test parity (the reference trains in fp32)
jax.config.update("jax_default_matmul_precision", "highest")
# persistent XLA:CPU compile cache: the tier is compile-bound (the
# ~20-30 s train-step compiles dominate); warm runs drop to a fraction
# of cold. Keyed by HLO, so code changes re-compile only what changed.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_compile_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
