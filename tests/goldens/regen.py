"""Regenerate the golden reference images (run from the repo root).

Only do this after a DELIBERATE integrator change; always diff the new
arrays against the old ones and explain the change in the commit message.
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import dataclasses

import numpy as np

from cpu_raytracing_experiments_tpu.render.api import Renderer
from cpu_raytracing_experiments_tpu.scene import builders
from cpu_raytracing_experiments_tpu.utils.config import RendererPolicy

HERE = os.path.dirname(os.path.abspath(__file__))
POL = RendererPolicy(max_bounces=6, rays_per_chunk=4096)
SIZE, SPP = 64, 10


def render(scene, policy=POL, size=SIZE, spp=SPP):
    r = Renderer(scene, policy, size, size)
    r.accumulate(spp)
    return r.render(tonemap=False)


def main():
    jobs = {
        "hero": lambda: render(builders.default_scene(SIZE, SIZE)),
        "cornell": lambda: render(builders.cornell_box_scene(SIZE, SIZE)),
        "white_furnace": lambda: render(builders.white_furnace_scene(SIZE, SIZE)),
        "bvh_test": lambda: render(builders.bvh_test_scene(SIZE, SIZE)),
        # GGX closure over the BRDF_test roughness lineup
        # (Application.cpp:123-217)
        "brdf_ggx": lambda: render(
            builders.brdf_test_scene(SIZE, SIZE),
            dataclasses.replace(POL, brdf="ggx"),
        ),
        # real thin-lens DoF (the capability the reference declares but
        # never wires, Camera.hpp:80-88)
        "dof": lambda: render(
            _dof_scene(), dataclasses.replace(POL, enable_dof=True)
        ),
        # triangle-mesh geometry (the pallas traversal's main workload);
        # 96x96 — the displaced mesh renders black at 64x64 framing
        "mesh": lambda: render(
            builders.mesh_scene(96, 96, subdivisions=3), POL, size=96
        ),
    }
    for name, fn in jobs.items():
        img = fn()
        size = img.shape[0]
        path = os.path.join(HERE, f"{name}_{size}x{size}_{SPP}spp.npy")
        np.save(path, img)
        print(f"{name:14s} mean={img.mean():.4f}  -> {path}")


def _dof_scene():
    import jax.numpy as jnp

    scene = builders.default_scene(SIZE, SIZE)
    return dataclasses.replace(
        scene,
        camera=dataclasses.replace(
            scene.camera,
            focus_distance=jnp.float32(1.3),
            aperture_radius=jnp.float32(0.05),
        ),
    )


if __name__ == "__main__":
    main()
