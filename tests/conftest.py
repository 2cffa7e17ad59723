"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set flags before the first `import jax` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# XLA:CPU's default matmul precision takes a bf16-class fast path (~1e-3 rel
# error) that breaks comparisons against float64 numpy oracles.
jax.config.update("jax_default_matmul_precision", "highest")
