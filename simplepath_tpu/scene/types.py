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
    """World-space baked triangle soup (shapes/Triangle.h:22-67).

    Stored as PER-COMPONENT 1-D arrays, not [T,3] rows: XLA lays out a
    [T,3] gather/reduce operand with the 3-extent dim in the 128-lane
    position (42.7x padding — six 13.8 GB temp copies on a 28.9M-tri
    lucy-class scene, measured); 1-D arrays tile losslessly and gather
    cleanly.  Hot paths (normal interpolation, differentiable re-intersect)
    gather components and stack AFTER the gather; the stacked row
    properties below are for host-side use and small brute-force scenes
    only — never use them on a lucy-scale table inside jit.
    """
    v0x: Any  # [T] vertex components
    v0y: Any
    v0z: Any
    v1x: Any
    v1y: Any
    v1z: Any
    v2x: Any
    v2y: Any
    v2z: Any
    n0x: Any  # [T] shading-normal components
    n0y: Any
    n0z: Any
    n1x: Any
    n1y: Any
    n1z: Any
    n2x: Any
    n2y: Any
    n2z: Any
    material_id: Any  # [T] int32

    @classmethod
    def from_rows(cls, v0, v1, v2, n0, n1, n2, material_id):
        """Build from [T,3] row arrays (host numpy or jnp)."""
        comps = {}
        for name, arr in (("v0", v0), ("v1", v1), ("v2", v2),
                          ("n0", n0), ("n1", n1), ("n2", n2)):
            for k, ax in enumerate("xyz"):
                comps[f"{name}{ax}"] = jnp.asarray(arr[:, k])
        return cls(material_id=jnp.asarray(material_id, jnp.int32), **comps)

    def _stack(self, name):
        return jnp.stack([getattr(self, name + ax) for ax in "xyz"], axis=-1)

    @property
    def v0(self):
        return self._stack("v0")

    @property
    def v1(self):
        return self._stack("v1")

    @property
    def v2(self):
        return self._stack("v2")

    @property
    def n0(self):
        return self._stack("n0")

    @property
    def n1(self):
        return self._stack("n1")

    @property
    def n2(self):
        return self._stack("n2")

    def gather_row(self, name: str, idx):
        """Stacked [..,3] of table ``name`` at ``idx`` — gathers the 1-D
        component arrays first, so no [T,3] operand ever materializes."""
        return jnp.stack([getattr(self, name + ax)[idx] for ax in "xyz"],
                         axis=-1)


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
    # >0 → bvh.records is a [D, M, 128] forest sharded across the "geom"
    # mesh axis (parallel/geom_shard.py); 0 → single replicated BVH
    geom_shards: int = 0


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
