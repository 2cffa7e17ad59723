"""Test configuration: run everything on a virtual 8-device CPU mesh.

The session environment pins JAX_PLATFORMS=axon (the real TPU); tests must
override it *before* touching any jax device API.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon setting

# XLA:CPU hard-aborts the whole process when an all-reduce's participant
# executions fail to co-schedule within 40 s (rendezvous.cc).  On a 1-core
# host running an 8-device virtual mesh the participants time-slice one
# core, so under load the deadline is flaky by construction — raise it.
# 180 s is far above the observed co-scheduling jitter (seconds) but keeps
# a GENUINE collective deadlock bounded well inside the foreground-command
# budget (ADVICE r2 #5: the earlier 900 s traded flakiness for a
# 15-minute hang per real deadlock).  Must be set before the backend
# initializes.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_collective_call_terminate_timeout_seconds=180"
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120")

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
