"""Persistent XLA compilation cache for the CLI, bench and tools.

The tests already persist compiled executables (tests/conftest.py); the
runtime entry points did not, so every process start re-paid TPU compile
time — through this environment's tunnel that is 40-540 s for the first
Pallas kernel and tens of minutes for the worst whole-program compiles
(the fused bs-2 train step, see CAPABILITIES.md). Enabling the standard
JAX persistent cache turns those into one-time costs per (program, jaxlib)
pair.

Opt out with DREAMVLA_COMPILE_CACHE=off; override the location with
DREAMVLA_COMPILE_CACHE=/path.
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> None:
    """Idempotent; call before the first jit compilation."""
    loc = os.environ.get("DREAMVLA_COMPILE_CACHE", "")
    if loc == "off":
        return
    import jax

    if jax.config.jax_compilation_cache_dir:  # already configured
        return
    if not loc:
        loc = os.path.join(os.path.expanduser("~"), ".cache",
                           "dreamvla_tpu", "xla")
    os.makedirs(loc, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", loc)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
