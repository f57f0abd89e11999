"""Scene model as JAX pytrees.

TPU-first redesign of the reference scene aggregate
(/root/reference/Scene.hpp:19-26, Primitives.hpp:7-47, Camera.hpp:61-89):
AoS ``std::vector<Sphere>`` / ``std::vector<Material>`` become
structure-of-arrays device arrays so intersection and shading are batched
gathers/broadcasts, and every runtime-editable quantity (positions, material
colors, camera pose) is a *traced* array — editing the scene re-runs the same
compiled executable, mirroring the reference's ImGui-edit ->
reset-accumulator loop without recompilation.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vec import Vec3, Quat

if True:  # typing-only import kept unconditional; BVHArrays is a pytree too
    from ..bvh.builder import BVHArrays


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class SphereGeometry:
    """SoA sphere list (Primitives.hpp:7-17): center, radius^2, material id."""

    center: Vec3  # [P]
    radius_sq: jnp.ndarray  # [P] f32
    material_id: jnp.ndarray  # [P] int32

    @property
    def count(self) -> int:
        return self.radius_sq.shape[0]


@_pytree_dataclass
class TriangleGeometry:
    """SoA triangle list — not present in the reference (spheres only); added
    for the Cornell-box / mesh configs (BASELINE.json configs 3 and 5)."""

    v0: Vec3  # [T]
    e1: Vec3  # [T] v1 - v0
    e2: Vec3  # [T] v2 - v0
    normal: Vec3  # [T] unit geometric normal
    material_id: jnp.ndarray  # [T] int32
    area: jnp.ndarray  # [T] f32 (for light sampling)

    @property
    def count(self) -> int:
        return self.material_id.shape[0]


@_pytree_dataclass
class MaterialTable:
    """SoA material table (Primitives.hpp:18-27)."""

    albedo: Vec3  # [M]
    f0: Vec3
    f80: Vec3
    emission: Vec3
    transmission: Vec3
    roughness: jnp.ndarray  # [M]
    ior_minus_one: jnp.ndarray  # [M]

    @property
    def count(self) -> int:
        return self.roughness.shape[0]


@_pytree_dataclass
class Sky:
    """Equirectangular environment (Primitives.hpp:29-47).

    ``hdri_*`` are flattened [H*W] per-channel planes (SoA) multiplied by the
    ambient tint at lookup. A 1x1 white texture reproduces a constant-
    radiance sky (the white-furnace setup) with the same code path.
    """

    ambient: Vec3  # scalar Vec3 tint
    hdri_r: jnp.ndarray  # [H*W]
    hdri_g: jnp.ndarray
    hdri_b: jnp.ndarray
    width: jnp.ndarray  # int32 scalar
    height: jnp.ndarray  # int32 scalar

    @staticmethod
    def constant(ambient=(0.0, 0.0, 0.0)) -> "Sky":
        one = jnp.ones((1,), jnp.float32)
        return Sky(
            ambient=Vec3.splat(ambient),
            hdri_r=one,
            hdri_g=one,
            hdri_b=one,
            width=jnp.int32(1),
            height=jnp.int32(1),
        )

    @staticmethod
    def from_image(img: np.ndarray, ambient=(1.0, 1.0, 1.0)) -> "Sky":
        """img: [H, W, >=3] float32 equirect radiance map."""
        h, w = img.shape[:2]
        img = np.asarray(img, np.float32)
        return Sky(
            ambient=Vec3.splat(ambient),
            hdri_r=jnp.asarray(img[..., 0].reshape(-1)),
            hdri_g=jnp.asarray(img[..., 1].reshape(-1)),
            hdri_b=jnp.asarray(img[..., 2].reshape(-1)),
            width=jnp.int32(w),
            height=jnp.int32(h),
        )

    def sample(self, d: Vec3) -> Vec3:
        """Nearest-texel equirect lookup (Primitives.hpp:35-46)."""
        fw = (self.width - 1).astype(jnp.float32)
        fh = (self.height - 1).astype(jnp.float32)
        u = fw * (0.5 + (0.5 / jnp.pi) * jnp.arctan2(d.z, d.x))
        v = fh * (0.5 - (1.0 / jnp.pi) * jnp.arcsin(jnp.clip(d.y, -1.0, 1.0)))
        ix = jnp.clip(u.astype(jnp.int32), 0, self.width - 1)
        iy = jnp.clip(v.astype(jnp.int32), 0, self.height - 1)
        flat = iy * self.width + ix
        return Vec3(
            self.hdri_r[flat] * self.ambient.x,
            self.hdri_g[flat] * self.ambient.y,
            self.hdri_b[flat] * self.ambient.z,
        )

    def has_ambient(self) -> jnp.ndarray:
        """max(ambient) > 0 gate (Renderer.hpp:79)."""
        return self.ambient.max_component() > 0.0


@_pytree_dataclass
class Camera:
    """Thin-lens camera (Camera.hpp:5-89). All fields traced scalars so pose /
    lens edits don't recompile. ``z = half_height * inv_half_tan`` with
    ``inv_half_tan = -2/sensor * focal_length`` (Camera.hpp:21-31)."""

    pos: Vec3  # scalar Vec3
    orient: Quat  # scalar quat (x, y, z, w)
    half_width: jnp.ndarray
    half_height: jnp.ndarray
    z: jnp.ndarray
    exposure: jnp.ndarray
    aperture_radius: jnp.ndarray  # world units; 0 => pinhole
    focus_distance: jnp.ndarray

    SENSOR_SIZE_MM = 24.0

    @staticmethod
    def create(
        eye,
        forward,
        width: int,
        height: int,
        focal_length: float = 50.0,
        focus_distance: float = 1.0,
        f_number: float = 16.0,
        exposure: float = 1.0,
        aperture_world_radius: Optional[float] = None,
    ) -> "Camera":
        orient = quat_look_at(np.asarray(forward, np.float64), np.array([0.0, 1.0, 0.0]))
        inv_half_tan = (-2.0 / Camera.SENSOR_SIZE_MM) * focal_length
        if aperture_world_radius is None:
            # focal/(2N) is in mm (Camera.hpp:17-19); convert to world (meter) units
            aperture_world_radius = focal_length / (2.0 * f_number) * 1e-3
        return Camera(
            pos=Vec3.splat(eye),
            orient=Quat(*[jnp.float32(c) for c in orient]),
            half_width=jnp.float32(width * 0.5),
            half_height=jnp.float32(height * 0.5),
            z=jnp.float32(height * 0.5 * inv_half_tan),
            exposure=jnp.float32(exposure),
            aperture_radius=jnp.float32(aperture_world_radius),
            focus_distance=jnp.float32(focus_distance),
        )

    def resized(self, width: int, height: int) -> "Camera":
        inv_half_tan = self.z / self.half_height
        return dataclasses.replace(
            self,
            half_width=jnp.float32(width * 0.5),
            half_height=jnp.float32(height * 0.5),
            z=jnp.float32(height * 0.5) * inv_half_tan,
        )


def quat_look_at(forward, up):
    """glm::quatLookAt(normalize(forward), up) on the host -> (x, y, z, w).

    Builds the RH view basis (right, up', -forward) and converts to a
    quaternion (Camera.hpp:48-49 semantics).
    """
    f = np.asarray(forward, np.float64)
    f = f / np.linalg.norm(f)
    z = -f
    x = np.cross(np.asarray(up, np.float64), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    m = np.stack([x, y, z], axis=1)  # columns
    # matrix -> quaternion (glm::quat_cast)
    t = m[0, 0] + m[1, 1] + m[2, 2]
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        qx = (m[2, 1] - m[1, 2]) / s
        qy = (m[0, 2] - m[2, 0]) / s
        qz = (m[1, 0] - m[0, 1]) / s
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        w = (m[2, 1] - m[1, 2]) / s
        qx = 0.25 * s
        qy = (m[0, 1] + m[1, 0]) / s
        qz = (m[0, 2] + m[2, 0]) / s
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        w = (m[0, 2] - m[2, 0]) / s
        qx = (m[0, 1] + m[1, 0]) / s
        qy = 0.25 * s
        qz = (m[1, 2] + m[2, 1]) / s
    else:
        s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        w = (m[1, 0] - m[0, 1]) / s
        qx = (m[0, 2] + m[2, 0]) / s
        qy = (m[1, 2] + m[2, 1]) / s
        qz = 0.25 * s
    return (qx, qy, qz, w)


@_pytree_dataclass
class LightAlias:
    """O(1) light selection over STATIC power weights (Vose alias method).

    The per-ray 'power' mode builds an [R, L] distance-weighted matrix per
    bounce — O(R*L) twice (selection + emissive-hit pdf), fine at L~10 but
    a wall for many-light scenes. This table drops the distance term:
    w_i = max_emission_i * size_i (r^2 for spheres, area for triangles —
    the position-independent numerator of the power weights), so selection
    is one alias-row gather and the hit-side pdf is one per-prim gather,
    both O(1) in L. Unbiased: the exact selection pdf feeds the same MIS.

    table rows: (prob, alias, pdf_bin, pdf_alias) — packing the alias
    bin's pdf beside its own means pdf-of-selected needs no second gather.
    alias indices ride as f32 (exact below 2^24 lights).
    """

    table: jnp.ndarray  # [L, 4] f32
    sphere_pdf: jnp.ndarray  # [n_spheres] f32 selection pdf, 0 = not a light
    tri_pdf: Optional[jnp.ndarray] = None  # [n_tris] f32


def _vose_alias(p: np.ndarray):
    """Vose's alias-table construction from a normalized pmf [L]."""
    n = p.size
    prob = (p * n).astype(np.float64)
    alias = np.arange(n, dtype=np.int64)
    small = [i for i in range(n) if prob[i] < 1.0]
    large = [i for i in range(n) if prob[i] >= 1.0]
    while small and large:
        s, g = small.pop(), large.pop()
        alias[s] = g
        prob[g] -= 1.0 - prob[s]
        (small if prob[g] < 1.0 else large).append(g)
    for i in small + large:
        prob[i] = 1.0
    return prob.astype(np.float32), alias


def build_light_alias(scene: "Scene") -> Optional[LightAlias]:
    """Host-side LightAlias build from a concrete Scene (the light-list
    analog of build_light_list; rebuilt by edit.apply_invalidation on the
    same Geometry|Material|Light edits)."""
    n_s = int(scene.lights.shape[0])
    n_t = 0 if scene.tri_lights is None else int(scene.tri_lights.shape[0])
    total = n_s + n_t
    if total == 0:
        return None
    em = np.stack(
        [np.asarray(scene.materials.emission.x),
         np.asarray(scene.materials.emission.y),
         np.asarray(scene.materials.emission.z)], axis=1,
    ).max(axis=1)
    weights = []
    if n_s > 0:
        sl = np.asarray(scene.lights)
        mid = np.asarray(scene.spheres.material_id)[sl]
        weights.append(em[mid] * np.asarray(scene.spheres.radius_sq)[sl])
    if n_t > 0:
        tl = np.asarray(scene.tri_lights)
        mid = np.asarray(scene.triangles.material_id)[tl]
        weights.append(em[mid] * np.asarray(scene.triangles.area)[tl])
    w = np.concatenate(weights).astype(np.float64)
    ws = w.sum()
    p = (w / ws) if ws > 0 else np.full(total, 1.0 / total)
    prob, alias = _vose_alias(p)
    p32 = p.astype(np.float32)
    table = np.stack(
        [prob, alias.astype(np.float32), p32, p32[alias]], axis=1
    )
    sphere_pdf = np.zeros(int(scene.spheres.radius_sq.shape[0]), np.float32)
    if n_s > 0:
        sphere_pdf[np.asarray(scene.lights)] = p32[:n_s]
    tri_pdf = None
    if scene.triangles is not None:
        tri_pdf = np.zeros(int(scene.triangles.area.shape[0]), np.float32)
        if n_t > 0:
            tri_pdf[np.asarray(scene.tri_lights)] = p32[n_s:]
        tri_pdf = jnp.asarray(tri_pdf)
    return LightAlias(
        table=jnp.asarray(table),
        sphere_pdf=jnp.asarray(sphere_pdf),
        tri_pdf=tri_pdf,
    )


@_pytree_dataclass
class Scene:
    """Full scene aggregate (Scene.hpp:19-26).

    ``lights`` is the NEE light list: indices of emissive sphere prims
    (LightingAcceleration, Scene.hpp:9-17), rebuilt host-side on material /
    geometry edits (Application.cpp:509).
    """

    spheres: SphereGeometry
    materials: MaterialTable
    lights: jnp.ndarray  # [L] int32 sphere indices with nonzero emission
    camera: Camera
    sky: Sky
    triangles: Optional[TriangleGeometry] = None
    tri_lights: Optional[jnp.ndarray] = None  # [L2] int32 triangle indices
    sphere_bvh: Optional["BVHArrays"] = None  # attached by scene.accel.with_bvh
    tri_bvh: Optional["BVHArrays"] = None
    sphere_grid: object = None  # UniformGrid, attached by scene.accel.with_grid
    tri_grid: object = None
    sphere_clusters: object = None  # ClusteredPrims (scene.accel.with_clusters)
    tri_clusters: object = None
    light_alias: Optional[LightAlias] = None  # O(1) light selection
    # (light_sampling='alias'); auto-built by make_scene, rebuilt on edits

    @property
    def num_lights(self) -> int:
        return int(self.lights.shape[0])


def build_light_list(material_ids: np.ndarray, emission: np.ndarray) -> np.ndarray:
    """Host-side LightingAcceleration (Scene.hpp:12-16): prims whose material
    has nonzero emission (dot(em, em) > 0)."""
    em = emission[material_ids]
    mask = (em * em).sum(-1) > 0.0
    return np.nonzero(mask)[0].astype(np.int32)


def make_scene(
    centers: np.ndarray,
    radii: np.ndarray,
    material_ids: np.ndarray,
    materials: dict,
    camera: Camera,
    sky: Sky,
    triangles: Optional[dict] = None,
) -> Scene:
    """Host-side scene assembly from numpy arrays.

    materials: dict of arrays with keys albedo, f0, f80, emission,
    transmission ([M,3]) and roughness, ior_minus_one ([M]).
    """
    centers = np.asarray(centers, np.float32)
    radii = np.asarray(radii, np.float32)
    material_ids = np.asarray(material_ids, np.int32)
    spheres = SphereGeometry(
        center=Vec3(
            jnp.asarray(centers[:, 0]),
            jnp.asarray(centers[:, 1]),
            jnp.asarray(centers[:, 2]),
        ),
        radius_sq=jnp.asarray(radii * radii),
        material_id=jnp.asarray(material_ids),
    )
    m = {k: np.asarray(v, np.float32) for k, v in materials.items()}
    table = MaterialTable(
        albedo=Vec3.from_stacked(jnp.asarray(m["albedo"])),
        f0=Vec3.from_stacked(jnp.asarray(m["f0"])),
        f80=Vec3.from_stacked(jnp.asarray(m["f80"])),
        emission=Vec3.from_stacked(jnp.asarray(m["emission"])),
        transmission=Vec3.from_stacked(jnp.asarray(m["transmission"])),
        roughness=jnp.asarray(m["roughness"]),
        ior_minus_one=jnp.asarray(m["ior_minus_one"]),
    )
    lights = build_light_list(material_ids, m["emission"])
    tri_geom = None
    tri_lights = None
    if triangles is not None:
        v0 = np.asarray(triangles["v0"], np.float32)
        v1 = np.asarray(triangles["v1"], np.float32)
        v2 = np.asarray(triangles["v2"], np.float32)
        tmid = np.asarray(triangles["material_id"], np.int32)
        e1 = v1 - v0
        e2 = v2 - v0
        n = np.cross(e1, e2)
        area2 = np.linalg.norm(n, axis=-1)
        n = n / np.maximum(area2[:, None], 1e-20)
        tri_geom = TriangleGeometry(
            v0=Vec3.from_stacked(jnp.asarray(v0)),
            e1=Vec3.from_stacked(jnp.asarray(e1)),
            e2=Vec3.from_stacked(jnp.asarray(e2)),
            normal=Vec3.from_stacked(jnp.asarray(n)),
            material_id=jnp.asarray(tmid),
            area=jnp.asarray(0.5 * area2),
        )
        tri_lights = jnp.asarray(build_light_list(tmid, m["emission"]))
    scene = Scene(
        spheres=spheres,
        materials=table,
        lights=jnp.asarray(lights),
        camera=camera,
        sky=sky,
        triangles=tri_geom,
        tri_lights=tri_lights,
    )
    return dataclasses.replace(scene, light_alias=build_light_alias(scene))
