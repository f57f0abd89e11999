"""Multi-host / multi-slice scaffolding.

Single-host multi-chip rendering needs nothing beyond parallel/sharded.py
(one process sees all local devices). For pods and multi-slice (DCN)
deployments, this module wires jax.distributed and builds meshes that keep
the pixel axis (`dp`) inside a slice (ICI) and the sample axis (`sp`)
across slices (DCN) — rendering is embarrassingly parallel across sample
shards, so the slow interconnect only ever carries the one-off bucket psum
at resolve time (SURVEY.md §5: distributed communication backend slot).

Untested on real pods in this repo (single-chip dev environment); the mesh
logic is exercised by tests on virtual CPU devices.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize passthrough (no-op if single-process).

    On TPU pods the arguments are auto-detected from the TPU environment;
    on GPU/CPU clusters pass them explicitly.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def pod_mesh(sp: int = 1) -> Mesh:
    """Global ('dp', 'sp') mesh over all addressable devices in a pod.

    Keeps `sp` groups contiguous in device order so each sample shard maps
    to a contiguous slice (ICI-local dp collectives, DCN only across sp).
    """
    devices = np.asarray(jax.devices())
    assert devices.size % sp == 0, (devices.size, sp)
    return Mesh(devices.reshape(devices.size // sp, sp), ("dp", "sp"))


def multi_slice_mesh(num_slices: int) -> Mesh:
    """One sample shard per slice: dp spans a slice's chips (ICI), sp spans
    slices (DCN)."""
    return pod_mesh(sp=num_slices)
