"""SceneArrays: the scene as a JAX pytree of SoA device arrays.

TPU-native replacement for the reference's pointer-based object graph
(``/root/reference/base/Scene.h``, ``shapes/*``, ``materials/*``,
``Lights/*``): every Hitable/Material/Light hierarchy becomes a table of
parameters plus an integer type tag; virtual dispatch becomes branchless
selects over those tags.

Static shape/config data (counts, depths, integrator choice) lives in
``SceneStatic`` which is hashable and rides in the pytree's aux data, so a
change of scene topology retriggers compilation but parameter edits
(albedo, radiance, transforms...) do not — this is what makes the renderer
differentiable w.r.t. scene parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SphereArrays", "PlaneArrays", "TriangleArrays", "BVHArrays",
    "MaterialArrays", "SphereLightArrays", "EnvLightArrays", "CameraArrays",
    "SceneStatic", "Scene",
    "MAT_LAMBERTIAN", "MAT_GLOSSY",
    "ENV_NONE", "ENV_CONST", "ENV_IBL",
    "INTEGRATORS",
]

MAT_LAMBERTIAN = 0
MAT_GLOSSY = 1

ENV_NONE = 0
ENV_CONST = 1
ENV_IBL = 2

# IntegratorType (Integrators/Integrator.h:18-28 + Integrator.cpp:25-51)
INTEGRATORS = (
    "mandelbrot",
    "brute_force",
    "brute_force_iterative",
    "brute_force_iterative_rr",
    "iterative_rrnee",
    "direct_lighting",
    "whitted",
    # Extension: the reference's adaptive-RR integrator exists
    # (Integrator.cpp:370-460) but is absent from its string factory
    # (Integrator.cpp:25-51); we expose it under the obvious name.
    "brute_force_iterative_dynamic_rr",
)


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class SphereArrays:
    """Unit spheres + affine transforms (shapes/Sphere.h)."""
    o2w_l: Any   # [S,3,3]
    o2w_t: Any   # [S,3]
    w2o_l: Any   # [S,3,3]
    w2o_t: Any   # [S,3]
    material_id: Any  # [S] int32


@_pytree_dataclass
class PlaneArrays:
    """y=0 planes + affine transforms (shapes/Plane.h)."""
    o2w_l: Any
    o2w_t: Any
    w2o_l: Any
    w2o_t: Any
    material_id: Any


@_pytree_dataclass
class TriangleArrays:
    """World-space baked triangle soup (shapes/Triangle.h:22-67)."""
    v0: Any  # [T,3]
    v1: Any
    v2: Any
    n0: Any  # [T,3] shading normals
    n1: Any
    n2: Any
    material_id: Any  # [T] int32


@_pytree_dataclass
class BVHArrays:
    """Flattened wide BVH over the bounded primitives, as a unified record
    table: one 512-byte f32 row per node (internal OR leaf) so every
    traversal step is a single wide row fetch — sized for the Pallas packet
    kernel's per-visit DMA.  See ``scene/bvh.py`` for the row format.
    TPU-native replacement for the pointer-chasing binary BVH
    (shapes/BVHAccelerator.h:37-121)."""
    records: Any    # [M,128] f32 (refs/indices stored as exact f32 values)


@_pytree_dataclass
class MaterialArrays:
    """Flattened material table.

    The DSL's closed material algebra (FileParser.cpp:379-523) is:
      lambertian | glossy(=Beckmann microfacet + lambertian, one-sample MIS)
      optionally wrapped in a clearcoat layer.
    One record per material: base_type tags the base; has_clearcoat gates the
    layer (materials/Material.h:723-806).
    """
    base_type: Any      # [M] int32
    albedo: Any         # [M,3] lambertian diffuse color
    roughness: Any      # [M] beckmann roughness (glossy only)
    ior: Any            # [M] microfacet fresnel ior (glossy only)
    has_clearcoat: Any  # [M] int32 0/1
    cc_ior: Any         # [M]
    cc_color: Any       # [M,3]


@_pytree_dataclass
class SphereLightArrays:
    """Sphere area lights (Lights/Light.h:336-388)."""
    o2w_l: Any
    o2w_t: Any
    w2o_l: Any
    w2o_t: Any
    radiance: Any  # [L,3]


@_pytree_dataclass
class EnvLightArrays:
    """Environment light: constant or image-based (Lights/Light.h:120-334).

    For ENV_CONST only ``radiance`` is meaningful.  For ENV_IBL ``image`` is
    the (clamped) radiance map, ``l2w``/``w2l`` the linear light transform,
    and the CDF tables importance-sample the 2x-resolution sin-weighted
    luminance (Light.h:302-329).
    """
    radiance: Any      # [3]
    image: Any         # [H,W,3] or dummy [1,1,3]
    l2w: Any           # [3,3]
    w2l: Any           # [3,3]
    cdf_cond_f: Any    # [nv,nu]
    cdf_cond: Any      # [nv,nu+1]
    cdf_cond_int: Any  # [nv]
    cdf_marg_f: Any    # [nv]
    cdf_marg: Any      # [nv+1]
    cdf_marg_int: Any  # []


@_pytree_dataclass
class CameraArrays:
    """User-level perspective-camera parameters (Cameras/Camera.h:85-117).

    The raster→world bake (look-at + fov + film dims → vx, vy, vz vectors,
    Camera.h:99-117) happens IN-GRAPH in ``render.camera.camera_vectors``, so
    rays — and therefore rendered images and losses — are differentiable
    w.r.t. eye / to / up / fov, not just the baked vectors."""
    eye: Any    # [3] camera origin ("origin:" in the .sp DSL)
    to: Any     # [3] look-at point
    up: Any     # [3] up vector
    fov: Any    # [] vertical field of view, degrees
    wh: Any     # [2] film (width, height) as f32 — bake constants, not trained


@dataclasses.dataclass(frozen=True)
class SceneStatic:
    """Hashable static scene config (compilation key)."""
    width: int
    height: int
    max_depth: int
    russian_roulette_depth: int
    integrator: str          # one of INTEGRATORS, resolved w/ CLI precedence
    num_spheres: int
    num_planes: int
    num_triangles: int
    num_sphere_lights: int
    env_kind: int            # ENV_NONE / ENV_CONST / ENV_IBL
    num_materials: int
    has_bvh: bool
    output_file_name: str = "image.pfm"
    # True → bounce loops use fixed-trip fori_loop (reverse-mode
    # differentiable); False → batch early-exit while_loop (faster inference)
    differentiable: bool = False


@dataclasses.dataclass(frozen=True)
class Scene:
    """The full scene: static config + array pytree."""
    static: SceneStatic
    spheres: SphereArrays
    planes: PlaneArrays
    triangles: TriangleArrays
    bvh: BVHArrays | None
    materials: MaterialArrays
    sphere_lights: SphereLightArrays
    env: EnvLightArrays | None
    camera: CameraArrays


jax.tree_util.register_dataclass(
    Scene,
    data_fields=["spheres", "planes", "triangles", "bvh", "materials",
                 "sphere_lights", "env", "camera"],
    meta_fields=["static"],
)


def _affine_pack(transforms) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Stack a list of (fwd_linear, fwd_t, inv_linear, inv_t) numpy tuples."""
    if not transforms:
        z3 = np.zeros((0, 3), np.float32)
        z33 = np.zeros((0, 3, 3), np.float32)
        return z33, z3, z33, z3
    fl = np.stack([t[0] for t in transforms]).astype(np.float32)
    ft = np.stack([t[1] for t in transforms]).astype(np.float32)
    il = np.stack([t[2] for t in transforms]).astype(np.float32)
    it = np.stack([t[3] for t in transforms]).astype(np.float32)
    return fl, ft, il, it
