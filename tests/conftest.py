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

import sys

# repo root on sys.path so a bare `pytest` entry point (any cwd) can import
# the package — the repo has no installer/pytest.ini and tests/ no __init__
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# This host compiles slowly; persist compiled executables across test runs
# (the helper picks the CPU-backend cache dir — one place owns the knobs).
import dlwpbench_tpu  # noqa: E402

dlwpbench_tpu.enable_compile_cache()
