"""Test configuration: force CPU backend with 8 fake devices.

Per SURVEY.md section 4, distributed tests run on
``--xla_force_host_platform_device_count=8`` fake CPU devices so the full DP
path (mesh + shard_map + psum) is exercised without a TPU pod. This must run
before jax initializes its backend, hence the env mutation at conftest import
time.
"""

import os

# NOTE: this container pins JAX_PLATFORMS=axon (TPU tunnel) via its site
# config, which overrides the env var; jax.config.update below is what
# actually forces CPU. XLA_FLAGS must still be set before backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep compilation deterministic and quiet in CI.
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
# This JAX build defaults matmuls to low (bf16-like, MXU-tuned) precision even
# on CPU (and ignores the JAX_DEFAULT_MATMUL_PRECISION env var); parity tests
# against fp32 torch/NumPy oracles need full fp32.
import jax  # noqa: E402  (after env mutation; backends init lazily)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: XLA-CPU compiles are slow in this container
# (~3-5s per tiny program); caching amortizes them across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/ganlab_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
