"""Checkpoint / resume for long progressive renders.

The reference's full render state is just the accumulator buckets plus the
accumulation counter (/root/reference/Renderer.hpp:46-48); it persists only
resolved screenshots (F5 -> .hdr, Application.cpp:254-257). Here the
accumulator itself is serialized, and because the RNG is counter-based,
rendering N more samples from a checkpoint is **bit-identical** to an
uninterrupted run — the preemption-recovery story for production renders
(SURVEY.md §5). A policy fingerprint guards against resuming under a
different sampling configuration (which would silently change the
estimator).
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..utils.config import RendererPolicy
from .estimator import RenderState

FORMAT_VERSION = 1


def policy_fingerprint(policy: RendererPolicy, width: int, height: int) -> str:
    fields = dataclasses.asdict(policy)
    fields.pop("rays_per_chunk", None)  # execution-only knob; safe to change
    return json.dumps({"policy": fields, "w": width, "h": height}, sort_keys=True)


def save(path, state: RenderState, policy: RendererPolicy, width: int, height: int):
    """Serialize render state to a single .npz."""
    extra = {}
    if state.reservoir is not None:
        # ReSTIR per-pixel reservoirs: part of the resumable state so a
        # resumed render continues bit-exactly
        extra["reservoir"] = np.asarray(state.reservoir)
    if state.counts is not None:
        # adaptive per-pixel pass counts: without them a resumed render's
        # count-aware resolve would fall back to the uniform divide and
        # mis-weight every adaptively-skipped pixel
        extra["counts"] = np.asarray(state.counts)
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        buckets=np.asarray(state.buckets),
        accumulations=np.asarray(state.accumulations),
        fingerprint=policy_fingerprint(policy, width, height),
        **extra,
    )


def load(path, policy: RendererPolicy, width: int, height: int) -> RenderState:
    """Load render state; refuses mismatched render configuration."""
    with np.load(path, allow_pickle=False) as z:
        version = int(z["version"])
        if version != FORMAT_VERSION:
            raise ValueError(f"checkpoint version {version} != {FORMAT_VERSION}")
        fp = str(z["fingerprint"])
        want = policy_fingerprint(policy, width, height)
        if fp != want:
            raise ValueError(
                "checkpoint was produced under a different render config:\n"
                f"  checkpoint: {fp}\n  requested:  {want}"
            )
        return RenderState(
            buckets=jnp.asarray(z["buckets"]),
            accumulations=jnp.uint32(z["accumulations"]),
            reservoir=(
                jnp.asarray(z["reservoir"]) if "reservoir" in z else None
            ),
            counts=jnp.asarray(z["counts"]) if "counts" in z else None,
        )


def exists(path) -> bool:
    return Path(path).exists()
