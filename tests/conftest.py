"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is validated
on virtual CPU devices, which is the TPU-native substitute for the
reference's (nonexistent) distributed tests (SURVEY.md §4).

Note: this environment pins JAX_PLATFORMS to the axon TPU tunnel via
sitecustomize (jax is already imported by the time conftest runs), so the
override must go through jax.config.update, not os.environ.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: repeated test runs skip recompilation.
import os as _os

_cache_dir = _os.path.expanduser("~/.cache/diffews_tpu_jax_cache")
_os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
