"""Tests for auxiliary math/inventory components: Morton codes, quaternions,
texture sampling with remap policies, and the adaptive dynamic-RR integrator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simplepath_tpu.core.morton import (morton_decode32, morton_decode64,
                                        morton_encode32, morton_encode64)
from simplepath_tpu.core.quaternion import (quat_abs, quat_apply, quat_conj,
                                            quat_from_basis, quat_identity,
                                            quat_lerp, quat_mul,
                                            quat_normalize,
                                            quat_rotate_axis_angle,
                                            quat_yaw_pitch_roll)
from simplepath_tpu.io.texture import (remap, sample_bilinear,
                                       sample_bilinear_true,
                                       sample_nearest_neighbor)


# ------------------------------------------------------------------ morton

def _ref_morton32(x, y):
    """Bit-by-bit reference interleave."""
    out = 0
    for b in range(16):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_morton32_roundtrip_and_reference():
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 1 << 16, 256).astype(np.uint32)
    ys = rng.integers(0, 1 << 16, 256).astype(np.uint32)
    code = np.asarray(morton_encode32(xs, ys))
    expected = np.array([_ref_morton32(int(x), int(y)) for x, y in zip(xs, ys)],
                        dtype=np.uint32)
    np.testing.assert_array_equal(code, expected)
    dx, dy = morton_decode32(code)
    np.testing.assert_array_equal(np.asarray(dx), xs)
    np.testing.assert_array_equal(np.asarray(dy), ys)


def test_morton32_tile_order_prefix():
    # The first 8 codes along x walk even bits: 0,1,4,5,16,17,20,21
    codes = np.asarray(morton_encode32(np.arange(8, dtype=np.uint32),
                                       np.zeros(8, np.uint32)))
    np.testing.assert_array_equal(codes, [0, 1, 4, 5, 16, 17, 20, 21])


def test_morton64_roundtrip():
    xs = np.asarray([0, 1, 0xFFFF, 0x12345, 0xFFFFFFFF], np.uint64)
    ys = np.asarray([0, 2, 0x8001, 0xABCDE, 0x0F0F0F0F], np.uint64)
    code = morton_encode64(xs, ys)
    dx, dy = morton_decode64(code)
    np.testing.assert_array_equal(np.asarray(dx, np.uint64), xs)
    np.testing.assert_array_equal(np.asarray(dy, np.uint64), ys)
    # 64-bit and 32-bit codes agree on 16-bit inputs
    c32 = np.asarray(morton_encode32(xs.astype(np.uint32) & 0xFFFF,
                                     ys.astype(np.uint32) & 0xFFFF))
    c64 = morton_encode64(xs & np.uint64(0xFFFF), ys & np.uint64(0xFFFF))
    np.testing.assert_array_equal(c32.astype(np.uint64), c64)


# -------------------------------------------------------------- quaternion

def test_quat_rotation_matches_matrix():
    axis = jnp.asarray([0.0, 0.0, 1.0])
    q = quat_rotate_axis_angle(axis, jnp.pi / 2)
    v = jnp.asarray([1.0, 0.0, 0.0])
    out = quat_apply(q, v)
    np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 0.0], atol=1e-6)


def test_quat_mul_identity_and_norm():
    q = quat_normalize(jnp.asarray([0.3, -0.2, 0.9, 0.1], jnp.float32))
    e = quat_identity()
    np.testing.assert_allclose(np.asarray(quat_mul(q, e)), np.asarray(q), atol=1e-7)
    np.testing.assert_allclose(float(quat_abs(q)), 1.0, atol=1e-6)
    # q * conj(q) = |q|^2 * identity
    qq = quat_mul(q, quat_conj(q))
    np.testing.assert_allclose(np.asarray(qq), [1, 0, 0, 0], atol=1e-6)


def test_quat_from_basis_recovers_rotation():
    rng = np.random.default_rng(3)
    for _ in range(8):
        axis = rng.normal(size=3)
        angle = rng.uniform(0, np.pi)
        q = quat_rotate_axis_angle(jnp.asarray(axis, jnp.float32), float(angle))
        # rotate the standard basis, rebuild the quaternion from it
        vx = quat_apply(q, jnp.asarray([1.0, 0, 0]))
        vy = quat_apply(q, jnp.asarray([0, 1.0, 0]))
        vz = quat_apply(q, jnp.asarray([0, 0, 1.0]))
        q2 = quat_from_basis(vx, vy, vz)
        # q and -q are the same rotation
        d = min(float(jnp.linalg.norm(q - q2)), float(jnp.linalg.norm(q + q2)))
        assert d < 1e-3


def test_quat_lerp_is_componentwise():
    q0 = jnp.asarray([1.0, 0, 0, 0])
    q1 = jnp.asarray([0.0, 1, 0, 0])
    mid = quat_lerp(q0, q1, 0.25)
    np.testing.assert_allclose(np.asarray(mid), [0.75, 0.25, 0, 0], atol=1e-7)


def test_quat_yaw_pitch_roll_axes():
    # pure yaw about +y by pi/2 maps +x to ... (reference convention: j term)
    q = quat_yaw_pitch_roll(jnp.float32(np.pi / 2), jnp.float32(0), jnp.float32(0))
    v = quat_apply(q, jnp.asarray([1.0, 0.0, 0.0]))
    assert abs(float(jnp.linalg.norm(v)) - 1.0) < 1e-5


# ----------------------------------------------------------------- texture

def _img():
    # 2x3 image, distinct texel colors
    img = np.arange(2 * 3 * 3, dtype=np.float32).reshape(2, 3, 3)
    return jnp.asarray(img)


def test_remap_policies():
    f = jnp.asarray([-0.25, 0.0, 0.5, 1.0, 1.75])
    out, ok = remap(f, "none")
    np.testing.assert_allclose(np.asarray(out), [-0.25, 0.0, 0.5, 1.0, 1.75])
    out, _ = remap(f, "clamp")
    assert float(out[0]) == 0.0 and float(out[3]) < 1.0 and float(out[4]) < 1.0
    out, ok = remap(f, "black")
    np.testing.assert_array_equal(np.asarray(ok), [False, True, True, False, False])
    out, _ = remap(f, "repeat")  # abs(fmod(f,1)): -0.25 -> 0.25 (mirrored)
    np.testing.assert_allclose(np.asarray(out), [0.25, 0.0, 0.5, 0.0, 0.75], atol=1e-6)
    out, _ = remap(f, "wrap")    # true positive modulus: -0.25 -> 0.75
    np.testing.assert_allclose(np.asarray(out), [0.75, 0.0, 0.5, 0.0, 0.75], atol=1e-6)


def test_nearest_matches_reference_rounding():
    img = _img()
    # s=0.4 -> round(0.4*3)=1, t=0.3 -> round(0.3*2)=1
    out = sample_nearest_neighbor(img, jnp.asarray(0.4), jnp.asarray(0.3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img[1, 1]))
    # clamping to last texel: s close to 1 rounds to W, clamps to W-1
    out = sample_nearest_neighbor(img, jnp.asarray(0.999), jnp.asarray(0.999),
                                  "clamp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(img[1, 2]))


def test_reference_bilinear_quirk_floor_corner():
    """The reference's ceil-floor weights return the floor corner for any
    non-integer u,v (Image.h:141-155)."""
    img = _img()
    out = sample_bilinear(img, jnp.asarray(0.55), jnp.asarray(0.3))
    # u=1.65 -> floor corner x=1; v=0.6 -> floor corner y=0
    np.testing.assert_allclose(np.asarray(out), np.asarray(img[0, 1]))


def test_true_bilinear_interpolates():
    img = _img()
    # midpoint between texel centers (0,0) and (1,0) along x
    s = (1.0) / 3.0   # u = s*W - 0.5 = 0.5 -> 50/50 x=0,x=1 at y row 0
    out = sample_bilinear_true(img, jnp.asarray(s), jnp.asarray(0.25))
    expected = 0.5 * (np.asarray(img[0, 0]) + np.asarray(img[0, 1]))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_texture_batched_shapes():
    img = _img()
    s = jnp.linspace(0.05, 0.95, 7)
    t = jnp.linspace(0.05, 0.95, 7)
    assert sample_nearest_neighbor(img, s, t).shape == (7, 3)
    assert sample_bilinear(img, s, t).shape == (7, 3)
    assert sample_bilinear_true(img, s, t).shape == (7, 3)


# ------------------------------------------------------- dynamic RR

def test_dynamic_rr_integrator_runs_and_matches_no_rr_early():
    """Before any bucket reaches 16 observations the adaptive integrator must
    equal the plain iterative one (RR never fires), and the stateful API must
    accumulate counts."""
    from simplepath_tpu import build_scene, parse_sp
    from simplepath_tpu.render.film import render_rays
    from simplepath_tpu.render.integrators import (
        integrate_brute_force_iterative,
        integrate_brute_force_iterative_dynamic_rr)
    from simplepath_tpu.render.materials import build_rho_tables
    from simplepath_tpu.render.camera import generate_ray

    scene_text = """version: 1
scene_parameters {
    output_file_name: "t.pfm"
    width: 8
    height: 8
    max_depth: 4
    russian_roulette_depth: 1
    integrator: brute_force_iterative
}
perspective_camera {
    origin: 0.0 1.0 4.0
    look_at: 0.0 0.5 0.0
    fov: 45
}
material_lambertian {
    name: "white"
    diffuse: 0.7 0.7 0.7
}
sphere {
    material: "white"
    scale: 1.0 1.0 1.0
    translate: 0.0 1.0 0.0
}
plane {
    material: "white"
}
environment_light {
    radiance: 1.0 1.0 1.0
}
"""
    scene = build_scene(parse_sp(scene_text))
    rho = build_rho_tables(scene.materials)
    n = 16
    xs = jnp.arange(n, dtype=jnp.int32) % 8
    ys = jnp.arange(n, dtype=jnp.int32) // 8
    px = xs.astype(jnp.float32) + 0.5
    py = ys.astype(jnp.float32) + 0.5
    ro, rd = generate_ray(scene.camera, px, py)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(n, dtype=jnp.uint32))

    L_plain = integrate_brute_force_iterative(scene, rho, ro, rd, keys)
    nd = scene.static.max_depth - scene.static.russian_roulette_depth
    stats0 = (jnp.zeros((n, nd), jnp.float32), jnp.zeros((n, nd), jnp.int32))
    L_dyn, (mean, count) = integrate_brute_force_iterative_dynamic_rr(
        scene, rho, ro, rd, keys, None, stats0)
    np.testing.assert_allclose(np.asarray(L_dyn), np.asarray(L_plain),
                               rtol=1e-5, atol=1e-6)
    assert int(count.max()) >= 1          # observations were recorded
    assert float(mean.max()) > 0.0

    # the film-level stateful path renders without error
    img = render_rays(scene, xs, ys, spp=2, key=jax.random.PRNGKey(0),
                      integrator="brute_force_iterative_dynamic_rr")
    assert img.shape == (n, 3)
    assert bool(jnp.all(jnp.isfinite(img)))
