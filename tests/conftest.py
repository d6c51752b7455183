"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test session
(hence this lives at the top of conftest, imported first by pytest).
"""

import os

# Force CPU: the shell exports JAX_PLATFORMS=axon (the real TPU tunnel),
# which must never be used for tests — tests want 8 virtual CPU devices.
# NOTE: sitecustomize (/root/.axon_site) imports jax before pytest loads this
# conftest, so the env var alone is too late; jax.config.update below is the
# authoritative override.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# This host compiles slowly; persist compiled executables across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/dlwpbench_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
