"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test session
(hence this lives at the top of conftest, imported first by pytest).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
