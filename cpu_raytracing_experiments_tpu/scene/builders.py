"""Reference scene builders as host-side constructors.

Ports of the four hard-coded scenes in /root/reference/Application.cpp:33-223
(Default, BVH_test, BRDF_test, White_Furnace) plus scenes the reference
lacks but the benchmark configs require (Cornell box with a triangle quad
light, random sphere fields of arbitrary size). Geometry/material values are
copied verbatim from the reference so renders are comparable.
"""
from __future__ import annotations

import numpy as np

from .scene import Camera, Scene, Sky, make_scene


def _empty_materials():
    return {
        "albedo": np.zeros((0, 3), np.float32),
        "f0": np.zeros((0, 3), np.float32),
        "f80": np.zeros((0, 3), np.float32),
        "emission": np.zeros((0, 3), np.float32),
        "transmission": np.zeros((0, 3), np.float32),
        "roughness": np.zeros((0,), np.float32),
        "ior_minus_one": np.zeros((0,), np.float32),
    }


class _SceneBuilder:
    """Incremental scene assembly mirroring the push_back flow of
    Application.cpp's constructors."""

    def __init__(self):
        self.mats = {k: [] for k in _empty_materials()}
        self.centers = []
        self.radii = []
        self.mat_ids = []
        self.tris = {"v0": [], "v1": [], "v2": [], "material_id": []}

    def material(
        self,
        albedo=(0, 0, 0),
        f0=(0, 0, 0),
        # F80 defaults to white: classic Schlick (F -> 1 at grazing) is the
        # degenerate two-point case, so materials that never set F80 shade
        # identically whether policy.shade_f80 is on or off.
        f80=(1, 1, 1),
        emission=(0, 0, 0),
        transmission=(0, 0, 0),
        roughness=0.0,
        ior_minus_one=0.0,
    ) -> int:
        self.mats["albedo"].append(albedo)
        self.mats["f0"].append(f0)
        self.mats["f80"].append(f80)
        self.mats["emission"].append(emission)
        self.mats["transmission"].append(transmission)
        self.mats["roughness"].append(roughness)
        self.mats["ior_minus_one"].append(ior_minus_one)
        return len(self.mats["albedo"]) - 1

    def sphere(self, center, radius, mat_id):
        self.centers.append(center)
        self.radii.append(radius)
        self.mat_ids.append(mat_id)

    def triangle(self, v0, v1, v2, mat_id):
        self.tris["v0"].append(v0)
        self.tris["v1"].append(v1)
        self.tris["v2"].append(v2)
        self.tris["material_id"].append(mat_id)

    def quad(self, v0, v1, v2, v3, mat_id):
        """Two triangles (v0,v1,v2) + (v0,v2,v3)."""
        self.triangle(v0, v1, v2, mat_id)
        self.triangle(v0, v2, v3, mat_id)

    def build(self, camera: Camera, sky: Sky) -> Scene:
        materials = {
            k: np.asarray(v, np.float32).reshape((-1, 3) if k not in ("roughness", "ior_minus_one") else (-1,))
            for k, v in self.mats.items()
        }
        tris = None
        if self.tris["v0"]:
            tris = {k: np.asarray(v) for k, v in self.tris.items()}
        return make_scene(
            np.asarray(self.centers, np.float32).reshape(-1, 3),
            np.asarray(self.radii, np.float32),
            np.asarray(self.mat_ids, np.int32),
            materials,
            camera,
            sky,
            triangles=tris,
        )


def default_scene(width: int = 256, height: int = 256) -> Scene:
    """Hero scene (Application.cpp:33-101): floor, 3 colored sphere lights,
    5 material-demo spheres, black ambient -> pure NEE lighting."""
    b = _SceneBuilder()
    floor = b.material(albedo=(1, 1, 1), f0=(0.8, 0.8, 0.8), f80=(0.9, 0.9, 0.9), roughness=0.2)
    b.sphere((0.3, -1.47, 0.0), 1.5, floor)
    m = b.material(emission=(2.5, 2.5, 20.0), albedo=(1, 1, 1), roughness=1.0)
    b.sphere((0.29999, 0.0801, 0.0), 0.05, m)
    m = b.material(emission=(15.0, 15.0, 15.0), albedo=(1, 1, 1), roughness=1.0)
    b.sphere((0.3302, 0.36165, 0.7119), 0.05, m)
    m = b.material(emission=(200.0, 17.0, 25.0), albedo=(1, 1, 1), roughness=1.0)
    b.sphere((-0.4857, -0.0242, -0.41383), 0.05, m)
    m = b.material(albedo=(0.793, 0.793, 0.664), f0=(0.04, 0.04, 0.04), f80=(0.5, 0.5, 0.5), roughness=0.85)
    b.sphere((0.3, 1.7, 0.0), 1.5, m)
    m = b.material(
        albedo=(0.05, 0.05, 0.05), f0=(0.03, 0.03, 0.03), f80=(0.5, 0.5, 0.5),
        transmission=(0.95, 0.95, 0.95), ior_minus_one=0.44, roughness=0.05,
    )
    b.sphere((0.018, 0.022, 0.07), 0.02, m)
    m = b.material(albedo=(1, 1, 1), f0=(0.944, 0.776, 0.373), f80=(0.8, 0.8, 0.6), roughness=0.15)
    b.sphere((-0.037, 0.022, 0.00), 0.03, m)
    m = b.material(
        albedo=(1, 1, 1), f0=(0.076288, 0.077375, 0.078887), f80=(0.47990, 0.48028, 0.48080),
        transmission=(0.670, 0.764, 0.855), ior_minus_one=0.762, roughness=0.1,
    )
    b.sphere((-0.0846, -0.0334, 0.283), 0.012, m)
    m = b.material(albedo=(1, 1, 1), f0=(0.04, 0.04, 0.04), f80=(0.5, 0.5, 0.5), roughness=0.8)
    b.sphere((0.03863, -0.00788, 0.2835), 0.012, m)
    cam = Camera.create(
        eye=(-0.2, 0.3, 1), forward=(0.1, -0.4, -1), width=width, height=height,
        focal_length=40.0, focus_distance=0.0, f_number=16.0, exposure=1.0,
    )
    return b.build(cam, Sky.constant((0.0, 0.0, 0.0)))


def white_furnace_scene(width: int = 256, height: int = 256) -> Scene:
    """Energy-conservation test (Application.cpp:218-223): unit-albedo sphere
    in a uniform white sky; a correct integrator renders it invisible."""
    b = _SceneBuilder()
    m = b.material(albedo=(1.0, 1.0, 1.0), roughness=1.0)
    b.sphere((0.0, 0.0, 0.0), 1.0, m)
    cam = Camera.create(eye=(0, 0, 3), forward=(0, 0, -1), width=width, height=height)
    return b.build(cam, Sky.constant((1.0, 1.0, 1.0)))


def bvh_test_scene(
    width: int = 512, height: int = 512, num_spheres: int = 255, seed: int = 0x04D15A07
) -> Scene:
    """Random sphere field (Application.cpp:102-122): y in [0,100], xz in
    [-100,100], radius in [0.3,20]. The reference's MT19937 stream is MSVC
    distribution-specific so exact values differ; the distribution matches.
    The reference samples material ids from an *empty* material table (UB);
    we give it a small palette instead."""
    b = _SceneBuilder()
    palette = [
        b.material(albedo=(0.8, 0.3, 0.3), roughness=1.0),
        b.material(albedo=(0.3, 0.8, 0.3), roughness=1.0),
        b.material(albedo=(0.3, 0.3, 0.8), roughness=1.0),
        b.material(albedo=(0.7, 0.7, 0.7), roughness=1.0),
        b.material(emission=(40.0, 38.0, 30.0), albedo=(1, 1, 1), roughness=1.0),
    ]
    rng = np.random.Generator(np.random.MT19937(seed))
    for _ in range(num_spheres):
        r = rng.uniform(0.3, 20.0)
        b.sphere(
            (rng.uniform(-100, 100), rng.uniform(0, 100), rng.uniform(-100, 100)),
            r,
            palette[int(rng.integers(0, len(palette)))],
        )
    cam = Camera.create(eye=(0, 60, 300), forward=(0, 0, -1), width=width, height=height)
    return b.build(cam, Sky.constant((1.0, 1.0, 1.0)))


BRDF_TEST_PROPERTIES = (
    "roughness", "roughness_diffuse", "ior_reflection", "ior_refraction",
    "roughness_glass", "absorption", "absorption_roughness",
    "refraction_to_diffuse",
)


def brdf_test_scene(
    width: int = 512, height: int = 512, gradations: int = 10,
    prop: str = "roughness",
) -> Scene:
    """Parameter-gradation lineup (Application.cpp:123-217): 10 spheres
    sweeping one material property over a giant floor sphere with an area
    light. The reference enumerates eight Properties cases but hard-codes
    Roughness (its switch selects a constant, :159) and its GGX/transmission
    shading never compiled; all eight render here (use brdf='principled'
    for the glass/absorption cases). Material values per case are the
    reference's verbatim (:161-215)."""
    assert prop in BRDF_TEST_PROPERTIES, prop
    b = _SceneBuilder()
    floor = b.material(albedo=(0.1, 0.1, 0.1), roughness=1.0)
    b.sphere((0.0, -1001.0, 0.0), 1000.0, floor)
    light = b.material(emission=(100.0, 100.0, 100.0))
    b.sphere((0.0, 10.0, 0.0), np.sqrt(5.0), light)  # radius_sq = 5.0 in ref
    lerp = lambda a, c, t: tuple((1 - t) * np.asarray(a) + t * np.asarray(c))
    for i in range(gradations):
        t = i / (gradations - 1)
        if prop == "roughness":
            m = b.material(f0=(1, 1, 1), f80=(1, 1, 1), albedo=(0, 0, 0), roughness=t)
        elif prop == "roughness_diffuse":
            m = b.material(f0=(0.04,) * 3, f80=(0.5,) * 3,
                           albedo=(0.75, 0.25, 0.25), roughness=t)
        elif prop == "ior_reflection":
            m = b.material(f0=(0.04,) * 3, f80=(0.5,) * 3,
                           albedo=(0.7, 0.5, 0.3), ior_minus_one=t)
        elif prop == "ior_refraction":
            m = b.material(f0=(0.04,) * 3, f80=(0.5,) * 3,
                           transmission=(0.95,) * 3, ior_minus_one=t * 0.5)
        elif prop == "roughness_glass":
            m = b.material(f0=(0.04,) * 3, f80=(0.5,) * 3,
                           transmission=(0.95,) * 3, ior_minus_one=0.1,
                           roughness=t)
        elif prop == "absorption":
            m = b.material(f0=(0.04,) * 3, f80=(0.5,) * 3,
                           transmission=lerp((0.95,) * 3, (0, 0.95, 0.95), t),
                           ior_minus_one=0.1)
        elif prop == "absorption_roughness":
            m = b.material(f0=(0.04,) * 3, f80=(0.5,) * 3,
                           transmission=(0.0, 0.95, 0.95), ior_minus_one=0.1,
                           roughness=t)
        else:  # refraction_to_diffuse
            m = b.material(f0=(0.04,) * 3, f80=(0.5,) * 3,
                           albedo=lerp((0, 0, 0), (0, 0.95, 0.95), t),
                           transmission=lerp((0.95,) * 3, (0, 0, 0), t))
        x = (i * 2 - gradations) * 1.25 + 1.0
        b.sphere((x, i * 0.1, 0.0), 1.0, m)
    cam = Camera.create(
        eye=(0, 0, gradations * 2.8), forward=(0, 0, -1), width=width, height=height
    )
    return b.build(cam, Sky.constant((1.0, 1.0, 1.0)))


def cornell_box_scene(width: int = 512, height: int = 512) -> Scene:
    """Triangle Cornell box with an emissive ceiling quad (BASELINE.json
    config 3). Not in the reference (sphere-only); standard Cornell layout
    in a unit-ish box [0,1]^3, camera looking down -Z."""
    b = _SceneBuilder()
    white = b.material(albedo=(0.73, 0.73, 0.73), roughness=1.0)
    red = b.material(albedo=(0.65, 0.05, 0.05), roughness=1.0)
    green = b.material(albedo=(0.12, 0.45, 0.15), roughness=1.0)
    light = b.material(emission=(17.0, 12.0, 4.0), albedo=(0.78, 0.78, 0.78))
    # box corners: x in [0,1], y in [0,1], z in [0,1]; open face at z=1
    # floor (y=0)
    b.quad((0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1), white)
    # ceiling (y=1)
    b.quad((0, 1, 0), (0, 1, 1), (1, 1, 1), (1, 1, 0), white)
    # back wall (z=0)
    b.quad((0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0), white)
    # left wall (x=0) red
    b.quad((0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0), red)
    # right wall (x=1) green
    b.quad((1, 0, 0), (1, 1, 0), (1, 1, 1), (1, 0, 1), green)
    # ceiling light quad (slightly below ceiling)
    l0, l1 = 0.35, 0.65
    y = 0.999
    b.quad((l0, y, l0), (l1, y, l0), (l1, y, l1), (l0, y, l1), light)
    # two content spheres instead of the classic boxes (keeps sphere+triangle
    # mixed-geometry path exercised)
    glossy = b.material(albedo=(0.8, 0.8, 0.9), roughness=0.3)
    b.sphere((0.3, 0.18, 0.35), 0.18, glossy)
    diffuse = b.material(albedo=(0.9, 0.7, 0.4), roughness=1.0)
    b.sphere((0.68, 0.13, 0.6), 0.13, diffuse)
    cam = Camera.create(
        eye=(0.5, 0.5, 2.2), forward=(0, 0, -1), width=width, height=height,
        focal_length=35.0,
    )
    return b.build(cam, Sky.constant((0.0, 0.0, 0.0)))


def random_spheres_scene(
    width: int = 512, height: int = 512, num_spheres: int = 1000,
    seed: int = 1234, emissive_fraction: float = 0.02,
) -> Scene:
    """Parameterized sphere field for BVH scaling benchmarks (BASELINE.json
    config 2: 1k spheres)."""
    b = _SceneBuilder()
    rng = np.random.Generator(np.random.MT19937(seed))
    mats = []
    for _ in range(16):
        mats.append(
            b.material(albedo=tuple(rng.uniform(0.2, 0.9, 3)), roughness=float(rng.uniform(0.1, 1.0)))
        )
    em = b.material(emission=(30.0, 28.0, 24.0), albedo=(1, 1, 1), roughness=1.0)
    for i in range(num_spheres):
        r = float(rng.uniform(0.3, 3.0))
        pos = (float(rng.uniform(-100, 100)), float(rng.uniform(0, 60)), float(rng.uniform(-100, 100)))
        mat = em if rng.uniform() < emissive_fraction else mats[int(rng.integers(0, len(mats)))]
        b.sphere(pos, r, mat)
    cam = Camera.create(eye=(0, 40, 220), forward=(0, -0.1, -1), width=width, height=height)
    return b.build(cam, Sky.constant((0.5, 0.6, 0.8)))


def mesh_scene(
    width: int = 512,
    height: int = 512,
    subdivisions: int = 6,
    obj_path=None,
    uv_res: int = 0,
) -> Scene:
    """Large triangle-mesh scene (BASELINE.json config 5 scale): a displaced
    icosphere (20*4^k tris; k=6 -> 81,920, k=7 -> 327,680), an exact-count
    displaced UV sphere (uv_res=224 -> 99,904 tris for the 100k spec), or a
    user OBJ, over a ground plane, lit by a sphere light + dim sky."""
    from . import meshes

    b = _SceneBuilder()
    ground = b.material(albedo=(0.6, 0.6, 0.6), roughness=1.0)
    b.sphere((0.0, -1000.8, 0.0), 1000.0, ground)
    light = b.material(emission=(400.0, 380.0, 320.0), albedo=(1, 1, 1))
    b.sphere((3.0, 4.0, 2.0), 0.5, light)
    body = b.material(albedo=(0.75, 0.71, 0.68), roughness=0.9)
    if obj_path:
        verts, faces = meshes.load_obj(obj_path)
        # normalize into a unit-ish object above the ground
        verts = verts - verts.mean(0)
        verts = verts / np.abs(verts).max()
    elif uv_res:
        verts, faces = meshes.displaced_uv_sphere(uv_res, uv_res)
    else:
        verts, faces = meshes.displaced_icosphere(subdivisions)
    tris = meshes.mesh_to_triangles(verts, faces, body)
    for k, v in tris.items():
        b.tris[k] = list(v)
    cam = Camera.create(
        eye=(0, 0.4, 3.2), forward=(0, -0.1, -1), width=width, height=height,
        focal_length=45.0,
    )
    return b.build(cam, Sky.constant((0.15, 0.18, 0.25)))


SCENES = {
    "default": default_scene,
    "white_furnace": white_furnace_scene,
    "bvh_test": bvh_test_scene,
    "brdf_test": brdf_test_scene,
    "cornell": cornell_box_scene,
    "random_spheres": random_spheres_scene,
    "mesh": mesh_scene,
}
