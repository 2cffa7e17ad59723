"""Test configuration: run everything on a virtual 8-device CPU mesh.

The session environment pins JAX_PLATFORMS=axon (the real TPU); tests must
override it *before* touching any jax device API.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon setting

# make the suite runnable from any cwd (pytest /root/repo/tests ...)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (_REPO_ROOT, os.path.dirname(os.path.abspath(__file__))):
    if _p not in sys.path:
        sys.path.insert(0, _p)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# XLA:CPU's default matmul precision takes a bf16-class fast path (~1e-3 rel
# error) that breaks comparisons against float64 numpy oracles.
jax.config.update("jax_default_matmul_precision", "highest")
