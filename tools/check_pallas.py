"""Compare packet_closest/anyhit (interpret mode) against the XLA traversal."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

from simplepath_tpu.scene.bvh import make_bvh_arrays
from simplepath_tpu.render.pallas_traverse import packet_closest, packet_anyhit
from simplepath_tpu.render import traverse as T
from simplepath_tpu.scene.types import (Scene, SceneStatic, TriangleArrays,
                                        SphereArrays, PlaneArrays,
                                        MaterialArrays, SphereLightArrays,
                                        CameraArrays)

rng = np.random.default_rng(0)
Ntri = 1200
# random small triangles scattered in [0,1]^3
c = rng.random((Ntri, 3)).astype(np.float32)
e1 = (rng.random((Ntri, 3)) - 0.5).astype(np.float32) * 0.1
e2 = (rng.random((Ntri, 3)) - 0.5).astype(np.float32) * 0.1
v0, v1, v2 = c, c + e1, c + e2
lo = np.minimum(np.minimum(v0, v1), v2)
hi = np.maximum(np.maximum(v0, v1), v2)
bvh, order = make_bvh_arrays(lo, hi, v0, v1, v2)
v0o, v1o, v2o = v0[order], v1[order], v2[order]
print("bvh rows:", bvh.records.shape)

Nray = 1500  # not a packet multiple on purpose
ro = rng.random((Nray, 3)).astype(np.float32) * 2 - 0.5
d = rng.normal(size=(Nray, 3)).astype(np.float32)
rd = d / np.linalg.norm(d, axis=-1, keepdims=True)
t_min = np.full(Nray, 1e-3, np.float32)
t_max = np.full(Nray, np.inf, np.float32)

# pallas (interpret)
t_p, i_p, b_p, g_p, valid_p = packet_closest(bvh.records, ro, rd, t_min, t_max,
                                             interpret=True)

# XLA reference path: build minimal scene with only triangles
z3 = np.zeros((0, 3), np.float32); z33 = np.zeros((0, 3, 3), np.float32)
zi = np.zeros((0,), np.int32)
tri = TriangleArrays.from_rows(v0o, v1o, v2o, v0o, v1o, v2o,
                               np.zeros(Ntri, np.int32))
static = SceneStatic(width=1, height=1, max_depth=1, russian_roulette_depth=1,
                     integrator="direct_lighting", num_spheres=0, num_planes=0,
                     num_triangles=Ntri, num_sphere_lights=0, env_kind=0,
                     num_materials=1, has_bvh=True)
scene = Scene(static=static,
              spheres=SphereArrays(z33, z3, z33, z3, zi),
              planes=PlaneArrays(z33, z3, z33, z3, zi),
              triangles=tri, bvh=bvh,
              materials=MaterialArrays(*(jnp.zeros(1) for _ in range(7))),
              sphere_lights=SphereLightArrays(z33, z3, z33, z3, z3),
              env=None,
              camera=CameraArrays(jnp.zeros(3), jnp.asarray([0.0, 0.0, 1.0]),
                                  jnp.asarray([0.0, 1.0, 0.0]),
                                  jnp.asarray(45.0), jnp.ones(2)))

hit = jax.vmap(lambda o, dd, a, b: T._bvh_closest(scene, o, dd, a, b))(
    jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(t_min), jnp.asarray(t_max))

valid_x = np.asarray(hit.valid)
t_x = np.asarray(jnp.where(hit.valid, hit.t, jnp.inf))
i_x = np.asarray(jnp.where(hit.valid, hit.idx, -1))

valid_p = np.asarray(valid_p); t_p = np.asarray(t_p); i_p = np.asarray(i_p)
print("hits pallas:", valid_p.sum(), " xla:", valid_x.sum())
mism_v = (valid_p != valid_x).sum()
print("valid mismatches:", mism_v)
both = valid_p & valid_x
dt = np.abs(t_p[both] - t_x[both])
print("max |t| diff:", dt.max() if both.any() else 0.0)
mism_i = (i_p[both] != i_x[both]).sum()
print("idx mismatches:", mism_i)

# anyhit
occ_p = np.asarray(packet_anyhit(bvh.records, ro, rd, t_min,
                                 np.full(Nray, 0.7, np.float32), interpret=True))
occ_x = np.asarray(jax.vmap(lambda o, dd, a, b: T._bvh_any(scene, o, dd, a, b))(
    jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(t_min),
    jnp.full((Nray,), 0.7)))
print("anyhit mismatches:", (occ_p != occ_x).sum(), " occluded:", occ_x.sum())

ok = mism_v == 0 and mism_i == 0 and (not both.any() or dt.max() < 1e-5) \
    and (occ_p != occ_x).sum() == 0
print("OK" if ok else "FAIL")
sys.exit(0 if ok else 1)
