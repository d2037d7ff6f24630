"""Test harness config.

Must run before jax initializes:
  * disable the axon TPU tunnel (PALLAS_AXON_POOL_IPS="") — tests run on CPU;
  * force an 8-device virtual CPU platform for multi-"chip" island/mesh
    tests (the standard way to test sharding without a pod, SURVEY.md §4).
"""

import os

# GJ_TESTS_TPU=1 opts into running on the real TPU backend (used by the
# hardware-only suites, e.g. test_delta_pallas_tpu.py — VERDICT r2 item 4:
# interpret-mode parity cannot catch Mosaic/VMEM failures). Default: CPU.
_ON_TPU = bool(os.environ.get("GJ_TESTS_TPU"))

if not _ON_TPU:
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

# The axon TPU tunnel registers its PJRT plugin from sitecustomize at
# interpreter boot — before this conftest runs — so the env vars above are
# not enough under pytest; force the platform through jax.config too (must
# happen before any backend is initialized).
import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: compile time dominates this suite (big fused
# step graphs), and the cache makes repeat runs fast
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
