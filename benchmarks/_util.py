"""Shared benchmark plumbing: the tunnel-safe timing protocol and the
persistent-compilation-cache preamble.

ONE copy on purpose — the protocol is easy to get subtly wrong (round 1's
pallas-vs-XLA table was wrong in both directions from a missing warm-up;
see bench.py's docstring and CLAUDE.md "Environment facts"), so every
benchmark script must share this implementation rather than re-type it.
"""

import time

import jax
import jax.numpy as jnp


def enable_compile_cache(path: str = "/tmp/jaxcache") -> None:
    """Persistent compilation cache — verified working through the axon
    tunnel backend; full-model compiles are minutes cold, seconds warm."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# chip dense-bf16 peaks for MFU (public spec sheets).  Exact match only:
# a silent startswith/default fallback made MFU quietly wrong on an
# unexpected device kind once — report None and let callers print
# mfu=null with a warning instead.
PEAK_BF16 = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
}


def chip_peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16.get(kind)
    if peak is None:
        import sys
        print(f"bench: unknown device kind {kind!r}; reporting mfu=null",
              file=sys.stderr)
    return peak


def compiled_flops(compiled) -> float:
    """FLOPs of an AOT-compiled executable from XLA cost analysis (0.0
    when the backend exposes none)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def bench(f, *a, iters: int = 40, warm: int = 3) -> float:
    """Time `f(*a, salt)` -> ms per iteration, tunnel-safely.

    Protocol (bench.py docstring has the full rationale):
      * `f`'s LAST argument is a float salt; `f` must derive distinct
        per-iteration inputs from it ON DEVICE and reduce its outputs to
        a scalar — provably defeats the backend's result cache;
      * iterations chain through an accumulator (each launch consumes the
        previous result) so async dispatch can't overlap what we measure
        away, and ONE D2H read fences the whole run;
      * the warm-up loop also runs CHAINED — the first chained execution
        pays a one-time ~60 ms cost that must not land in the timed loop;
      * distinct salt ranges for warm-up vs timing keep even the warm-up
        executions out of any result cache.
    """
    acc = jnp.zeros(())
    for i in range(warm):
        acc = acc + f(*a, float(i))
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(iters):
        acc = acc + f(*a, float(10 + i))
    float(acc)
    return (time.perf_counter() - t0) / iters * 1e3
