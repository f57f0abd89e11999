"""Scene editing with selective invalidation.

Port of the reference's UpdateTracker flow (/root/reference/
Application.cpp:335-358, 508-510): every edit ORs a SceneUpdate bit; at
commit time,
  * Geometry                      -> rebuild the BVH
  * Geometry | Material | Light   -> rebuild the NEE light list
  * anything                      -> reset the accumulator.
Edits are pure functions Scene -> Scene on the device pytree (same compiled
executable keeps running — no retrace), and `SceneEditor` accumulates the
dirty bits exactly like the ImGui loop did.
"""
from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp
import numpy as np

from ..core.vec import Vec3
from .scene import Scene, build_light_list


class SceneUpdate(enum.IntFlag):
    """Application.cpp:335-341."""

    NULL = 0
    GEOMETRY = 1
    MATERIAL = 2
    LIGHT = 4
    AMBIENT = 8
    CAMERA = 16

    @property
    def needs_bvh(self) -> bool:
        return bool(self & SceneUpdate.GEOMETRY)

    @property
    def needs_light_list(self) -> bool:
        return bool(
            self & (SceneUpdate.GEOMETRY | SceneUpdate.MATERIAL | SceneUpdate.LIGHT)
        )


def _set_component(vec: Vec3, index: int, value) -> Vec3:
    return Vec3(
        vec.x.at[index].set(value[0]),
        vec.y.at[index].set(value[1]),
        vec.z.at[index].set(value[2]),
    )


def set_sphere(
    scene: Scene, index: int, position=None, radius=None, material_id=None
):
    """Edit one sphere (scene editor geometry panel,
    Application.cpp:463-471). Returns (scene, flags)."""
    spheres = scene.spheres
    flags = SceneUpdate.NULL
    if position is not None:
        spheres = dataclasses.replace(
            spheres, center=_set_component(spheres.center, index, position)
        )
        flags |= SceneUpdate.GEOMETRY
    if radius is not None:
        spheres = dataclasses.replace(
            spheres, radius_sq=spheres.radius_sq.at[index].set(radius * radius)
        )
        flags |= SceneUpdate.GEOMETRY
    if material_id is not None:
        spheres = dataclasses.replace(
            spheres,
            material_id=spheres.material_id.at[index].set(material_id),
        )
        flags |= SceneUpdate.MATERIAL
    return dataclasses.replace(scene, spheres=spheres), flags


def set_material(scene: Scene, index: int, **fields):
    """Edit one material (Application.cpp:474-487). Vec3 fields: albedo, f0,
    f80, emission, transmission; scalars: roughness, ior_minus_one."""
    mats = scene.materials
    updates = {}
    for name, value in fields.items():
        cur = getattr(mats, name)
        if isinstance(cur, Vec3):
            updates[name] = _set_component(cur, index, value)
        else:
            updates[name] = cur.at[index].set(value)
    return (
        dataclasses.replace(scene, materials=dataclasses.replace(mats, **updates)),
        SceneUpdate.MATERIAL,
    )


def set_ambient(scene: Scene, color):
    """Application.cpp:503."""
    sky = dataclasses.replace(scene.sky, ambient=Vec3.splat(color))
    return dataclasses.replace(scene, sky=sky), SceneUpdate.AMBIENT


def set_camera(scene: Scene, **fields):
    """Camera pose/lens edits (Application.cpp:413-417). Fields: pos (3,),
    focus_distance, aperture_radius, exposure, z."""
    cam = scene.camera
    updates = {}
    for name, value in fields.items():
        if name == "pos":
            updates[name] = Vec3.splat(value)
        else:
            updates[name] = jnp.float32(value)
    return (
        dataclasses.replace(scene, camera=dataclasses.replace(cam, **updates)),
        SceneUpdate.CAMERA,
    )


def apply_invalidation(scene: Scene, flags: SceneUpdate) -> Scene:
    """End-of-frame rebuilds (Application.cpp:508-510)."""
    if flags.needs_light_list:
        emission = np.stack(
            [
                np.asarray(scene.materials.emission.x),
                np.asarray(scene.materials.emission.y),
                np.asarray(scene.materials.emission.z),
            ],
            axis=1,
        )
        lights = build_light_list(np.asarray(scene.spheres.material_id), emission)
        scene = dataclasses.replace(scene, lights=jnp.asarray(lights))
        if scene.triangles is not None:
            tri_lights = build_light_list(
                np.asarray(scene.triangles.material_id), emission
            )
            scene = dataclasses.replace(scene, tri_lights=jnp.asarray(tri_lights))
        from .scene import build_light_alias

        scene = dataclasses.replace(scene, light_alias=build_light_alias(scene))
    if flags.needs_bvh and scene.sphere_bvh is not None:
        from . import accel

        scene = accel.with_bvh(scene)
    return scene


class SceneEditor:
    """Stateful editor around a Renderer, reproducing the ImGui loop's
    edit -> track -> invalidate cycle."""

    def __init__(self, renderer):
        self.renderer = renderer
        self.flags = SceneUpdate.NULL

    def edit(self, fn, *args, **kwargs):
        scene, flags = fn(self.renderer.scene, *args, **kwargs)
        self.renderer.scene = scene
        self.flags |= flags
        return self

    def commit(self):
        """Rebuild + reset, like the end of UIRender (Application.cpp:508-510)."""
        if self.flags != SceneUpdate.NULL:
            self.renderer.scene = apply_invalidation(self.renderer.scene, self.flags)
            self.renderer.reset_accumulator()
            self.flags = SceneUpdate.NULL
        return self


# ---------------------------------------------------------------------------
# Fly-camera motion (View::Rotate / View::Translate, Camera.hpp:47-59 +
# the WASDQE/mouse handling of Application.cpp:309-333). Host-side quat
# math; returns (scene, CAMERA flag) like the other edits — callers reset
# the accumulator on commit exactly as the reference does (:332).
# ---------------------------------------------------------------------------
def _quat_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ]
    )


def _quat_conj(q):
    return np.array([-q[0], -q[1], -q[2], q[3]])


def _quat_from_euler(angles):
    """glm::quat{vec3 euler} (pitch, yaw, roll), XYZ intrinsic."""
    half = np.asarray(angles, np.float64) * 0.5
    cx, cy, cz = np.cos(half)
    sx, sy, sz = np.sin(half)
    return np.array(
        [
            sx * cy * cz - cx * sy * sz,
            cx * sy * cz + sx * cy * sz,
            cx * cy * sz - sx * sy * cz,
            cx * cy * cz + sx * sy * sz,
        ]
    )


def _camera_quat(scene):
    c = scene.camera.orient
    return np.array([float(c.x), float(c.y), float(c.z), float(c.w)])


def rotate_camera_local(scene: Scene, angles):
    """View::Rotate (Camera.hpp:51-53): orient = conj(normalize(quat(angles)
    * conj(orient))). angles = (pitch, yaw, roll) radians."""
    from ..core.vec import Quat

    q = _camera_quat(scene)
    rot = _quat_from_euler(angles)
    new = _quat_conj(_quat_mul(rot, _quat_conj(q)))
    new = new / np.linalg.norm(new)
    cam = dataclasses.replace(
        scene.camera,
        orient=Quat(*[jnp.float32(v) for v in new]),
    )
    return dataclasses.replace(scene, camera=cam), SceneUpdate.CAMERA


def translate_camera_local(scene: Scene, local):
    """View::Translate (Camera.hpp:54-56): pos += orient * local."""
    q = _camera_quat(scene)
    v = np.asarray(local, np.float64)
    qv = q[:3]
    t = 2.0 * np.cross(qv, v)
    world = v + q[3] * t + np.cross(qv, t)
    pos = np.array(
        [float(scene.camera.pos.x), float(scene.camera.pos.y),
         float(scene.camera.pos.z)]
    ) + world
    cam = dataclasses.replace(scene.camera, pos=Vec3.splat(pos))
    return dataclasses.replace(scene, camera=cam), SceneUpdate.CAMERA


def set_camera_lens(
    scene: Scene,
    width: int,
    height: int,
    focal_length: float = None,
    f_number: float = None,
    focus_distance: float = None,
    exposure: float = None,
):
    """Lens-parameter edits with UpdateLens recompute (Camera.hpp:21-26 +
    the ImGui camera sliders, Application.cpp:413-417): focal length and
    f-number re-derive the projection z and the aperture radius."""
    from .scene import Camera

    cam = scene.camera
    updates = {}
    cur_focal = float(-Camera.SENSOR_SIZE_MM / 2.0 * (cam.z / cam.half_height))
    focal = focal_length if focal_length is not None else cur_focal
    if focal_length is not None:
        inv_half_tan = (-2.0 / Camera.SENSOR_SIZE_MM) * focal
        updates["z"] = jnp.float32(height * 0.5 * inv_half_tan)
    if f_number is not None:
        updates["aperture_radius"] = jnp.float32(focal / (2.0 * f_number) * 1e-3)
    if focus_distance is not None:
        updates["focus_distance"] = jnp.float32(focus_distance)
    if exposure is not None:
        updates["exposure"] = jnp.float32(exposure)
    return (
        dataclasses.replace(scene, camera=dataclasses.replace(cam, **updates)),
        SceneUpdate.CAMERA,
    )
