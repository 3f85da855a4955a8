"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual CPU mesh (SURVEY.md §4:
`xla_force_host_platform_device_count`), so CI needs no TPU. Must run before
jax initializes its backends, hence env setup at conftest import time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force (the image sets JAX_PLATFORMS=axon)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (after env setup)

# The image's axon sitecustomize registers the TPU backend in a way that
# overrides the JAX_PLATFORMS env var; the config update below is the
# reliable way to force the 8-virtual-device CPU mesh for tests.
jax.config.update("jax_platforms", "cpu")

# Numeric tests compare against float64-ish references; keep MXU-emulating
# bf16 matmul defaults out of the unit-test path.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the brute-force rasterizer scans are
# compile-heavy; caching across test sessions cuts reruns dramatically.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_comfy3d")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
