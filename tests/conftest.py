"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths (parallel/) are exercised without TPU hardware,
per SURVEY.md §4's test strategy.

Note: this environment pre-imports jax at interpreter startup (axon
sitecustomize), so env vars like JAX_PLATFORMS/XLA_FLAGS are too late —
the config API is the reliable switch.
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free XLA:CPU compiler state between test modules. The full suite's
    ~230 in-process compilations accumulate enough jit/LLVM state that the
    CPU backend segfaults inside backend_compile_and_load near the end of
    the run (reproducible at suite scale only — every module passes alone).
    Dropping executable caches at module boundaries keeps peak compiler
    state bounded; modules recompile their own configs anyway, so the
    wall-clock cost is small."""
    yield
    jax.clear_caches()
