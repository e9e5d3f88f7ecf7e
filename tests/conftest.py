import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware. Must be set before jax initialises its backends.
# Force CPU: the ambient environment routes JAX to the 'axon' TPU tunnel —
# and its sitecustomize sets jax.config.jax_platforms *programmatically*
# (beating env vars), so the config update below is the one that sticks.
#
# DREAMVLA_TPU_TESTS=1 opts OUT of the CPU pin: the suite then runs on the
# ambient (axon TPU) backend so on-chip-only tests (int8 serving path,
# Pallas kernels) execute for real. CPU-suite tests that require the
# 8-device mesh guard themselves; TPU-only tests skip on the CPU suite via
# `jax.default_backend() != "tpu"`.
_TPU_TESTS = os.environ.get("DREAMVLA_TPU_TESTS") == "1"
if not _TPU_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not _TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")
# Golden tests compare against fp32 torch oracles; the environment's default
# matmul precision is bf16-class even on CPU, so pin it for tests only.
# CPU suite ONLY: on the TPU suite a global 'highest' pin forces f32
# multi-pass MXU emulation inside the Pallas kernels, which crashes the
# environment's remote compile helper (HTTP 500 at the flash kernel's
# dot_general, seen via tests/test_int8_openloop.py). On-chip oracle
# comparisons scope their own `with jax.default_matmul_precision(...)`.
if not _TPU_TESTS:
    jax.config.update("jax_default_matmul_precision", "highest")

# The suite is jit-compile dominated (tiny models, many configs). Persist
# compiled executables across runs/files so only genuinely new graphs pay
# XLA compile time; a warm cache cuts the CPU suite severalfold.
_cache_dir = os.environ.get(
    "DREAMVLA_TEST_COMPILE_CACHE",
    os.path.join(os.path.dirname(__file__),
                 ".jax_compile_cache_tpu" if _TPU_TESTS
                 else ".jax_compile_cache"))
if _cache_dir != "off":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

if not _TPU_TESTS:
    assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu", (
        "tests must run on the 8-device virtual CPU mesh")

# Init-params disk cache (same idea as the compile cache above: full-model
# init traces ~20-30 s per config on this 1-core host). Keyed by a hash of
# every package source, so any code edit invalidates; committed warm so a
# fresh clone's first suite run benefits too. DREAMVLA_TEST_PARAM_CACHE=off
# disables.
from dreamvla_tpu.utils import testing as _testing  # noqa: E402

_pcache = os.environ.get(
    "DREAMVLA_TEST_PARAM_CACHE",
    os.path.join(os.path.dirname(__file__), ".param_cache"))
if _pcache != "off":
    _testing.set_param_cache_dir(_pcache)
