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
