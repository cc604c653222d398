"""Cross-validation of the rho-table lobe-selection weights.

The one deliberate estimator deviation from the reference (see
render/materials.py module docstring): OneSampleMaterial's lobe-selection
weights come from a per-hit 16-sample Monte-Carlo rho estimate in the
reference (/root/reference/materials/Material.h:299-310 ``rho_impl``,
:545-572 ``get_selection_weights``) but from a precomputed directional-
albedo table here.  One-sample MIS is unbiased for ANY selection weights,
so the deviation is variance-only — these tests close the argument
empirically (round-2 VERDICT task 5):

1. the table value equals the EXPECTATION of the reference's 16-sample MC
   estimator over a (cos_theta_o, roughness) grid, within MC standard error;
2. the induced lobe-selection probabilities agree the same way;
3. a full-render A/B on the glossy golden scene with per-hit MC-rho weights
   (the reference's weighting, re-implemented here) vs table weights shows a
   mean difference indistinguishable from seed noise.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplepath_tpu import load_scene, render_image
from simplepath_tpu.core.color import relative_luminance
from simplepath_tpu.core.smath import abs_cos_theta
from simplepath_tpu.render import materials
from simplepath_tpu.render.materials import (
    RHO_TABLE_SIZE, _microfacet_sample, build_rho_tables, roughness_to_alpha)
from simplepath_tpu.scene.types import MAT_GLOSSY, MaterialArrays

HERE = os.path.dirname(os.path.abspath(__file__))
SCENES = os.path.join(HERE, "scenes")

RHO_EVALS = 16  # the reference's constexpr rho_evals (Material.h:548)


def mc_rho_microfacet(alpha, ior, wo, key, n=RHO_EVALS):
    """The reference's BRDF::rho_impl (Material.h:299-310) for the
    microfacet lobe: (1/n) * sum sample().color * |cos wi| / pdf over n
    draws from the lobe's own sampling routine."""
    us = jax.random.uniform(key, (n, 2))

    def one(u2):
        color, wi, pdf = _microfacet_sample(wo, alpha, ior, u2)
        return jnp.where(pdf > 0.0, color * abs_cos_theta(wi)
                         / jnp.where(pdf > 0.0, pdf, 1.0), 0.0)

    return jnp.mean(jax.vmap(one)(us))


def _glossy_material_arrays(roughness, ior=1.5, albedo=(0.6, 0.4, 0.3)):
    return MaterialArrays(
        base_type=jnp.asarray([MAT_GLOSSY], jnp.int32),
        albedo=jnp.asarray([albedo], jnp.float32),
        roughness=jnp.asarray([roughness], jnp.float32),
        ior=jnp.asarray([ior], jnp.float32),
        has_clearcoat=jnp.asarray([0], jnp.int32),
        cc_ior=jnp.asarray([1.5], jnp.float32),
        cc_color=jnp.asarray([(1.0, 1.0, 1.0)], jnp.float32))


def _table_lookup(table, cos_o):
    """The exact interpolation _selection_weights uses."""
    K = RHO_TABLE_SIZE
    c = jnp.clip(cos_o * K - 0.5, 0.0, K - 1.0)
    i0 = jnp.floor(c).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, K - 1)
    frac = c - i0.astype(c.dtype)
    return (1.0 - frac) * table[i0] + frac * table[i1]


@pytest.mark.parametrize("roughness", [0.05, 0.2, 0.6, 1.0])
def test_rho_table_matches_mc_expectation(roughness):
    """Table rho == E[16-sample MC rho] within MC standard error, over a
    cos_theta_o sweep (the reference's estimator is unbiased, so both
    estimate the microfacet directional albedo)."""
    mats = _glossy_material_arrays(roughness)
    table = build_rho_tables(mats)[0]                     # [RHO_TABLE_SIZE]
    alpha = roughness_to_alpha(mats.roughness[0])
    ior = mats.ior[0]
    reps = 512

    for cos_o in (0.12, 0.35, 0.6, 0.92):
        so = float(np.sqrt(1.0 - cos_o * cos_o))
        wo = jnp.asarray([so, cos_o, 0.0], jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(hash((roughness, cos_o)) % (2**31)), reps)
        ests = jax.vmap(lambda k: mc_rho_microfacet(alpha, ior, wo, k))(keys)
        ests = np.asarray(ests)
        mc_mean = ests.mean()
        se = ests.std() / np.sqrt(reps)
        tab = float(_table_lookup(table, jnp.asarray(cos_o)))
        # 5 sigma of the rep-averaged MC + the table's own MC/interp budget
        tol = 5.0 * se + 0.015 * max(mc_mean, 0.05)
        assert abs(tab - mc_mean) < tol, (
            f"r={roughness} cos={cos_o}: table {tab:.4f} vs "
            f"E[MC16] {mc_mean:.4f} +- {se:.4f}")


def test_selection_probability_matches_reference_weighting():
    """Lobe-selection probability P(pick microfacet) from the table equals
    the EXPECTED probability under the reference's per-hit MC weighting
    (Material.h:545-572: w = lum(rho_mf) / (lum(rho_mf) + lum(rho_lam)),
    lambertian rho analytic = albedo, Material.h:344-347)."""
    mats = _glossy_material_arrays(0.4)
    table = build_rho_tables(mats)[0]
    alpha = roughness_to_alpha(mats.roughness[0])
    ior = mats.ior[0]
    w_lam = float(relative_luminance(mats.albedo[0]))
    reps = 512

    for cos_o in (0.2, 0.5, 0.85):
        so = float(np.sqrt(1.0 - cos_o * cos_o))
        wo = jnp.asarray([so, cos_o, 0.0], jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(int(cos_o * 1000)), reps)
        rhos = np.asarray(jax.vmap(
            lambda k: mc_rho_microfacet(alpha, ior, wo, k))(keys))
        # reference: weight is computed per hit from the random rho —
        # expected selection probability is E[rho/(rho+w_lam)]
        p_ref = (rhos / (rhos + w_lam)).mean()
        se = (rhos / (rhos + w_lam)).std() / np.sqrt(reps)
        tab = float(_table_lookup(table, jnp.asarray(cos_o)))
        p_tab = tab / (tab + w_lam)
        # E[f(X)] != f(E[X]) exactly (Jensen), but at 16 samples the bias is
        # second-order small; allow it in the tolerance
        assert abs(p_tab - p_ref) < 5.0 * se + 0.02, (
            f"cos={cos_o}: P_table {p_tab:.4f} vs E[P_MC16] {p_ref:.4f}")


def test_glossy_render_ab_mc_vs_table_weights(monkeypatch):
    """Full-render A/B on the glossy golden scene: per-hit MC-rho selection
    weights (the reference's weighting) vs our table weights.  Both are
    valid weights for the unbiased one-sample MIS estimator, so the image
    MEANS must agree within seed noise (measured from table-weight renders
    under different keys)."""
    from simplepath_tpu.parallel import mesh as mesh_mod

    scene = load_scene(os.path.join(SCENES, "g_glossy.sp"))
    spp = 16

    def render(key):
        return np.asarray(render_image(scene, spp=spp,
                                       key=jax.random.PRNGKey(key)))

    means = [render(k).mean() for k in (11, 22, 33)]
    seed_sigma = float(np.std(means))
    base_mean = float(np.mean(means))

    def mc_selection_weights(m, wo):
        # per-hit pseudo-random key from the wo bits — a deterministic
        # stand-in for the reference's per-hit sampler stream
        kb = jax.lax.bitcast_convert_type(wo, jnp.int32)
        key = jax.random.PRNGKey(977)
        for j in range(3):
            key = jax.random.fold_in(key, kb[j])
        alpha = roughness_to_alpha(m.roughness)
        rho_mf = mc_rho_microfacet(alpha, m.ior, wo, key)
        w_mf = jnp.where(m.base_type == MAT_GLOSSY, rho_mf, 0.0)
        w_lam = relative_luminance(m.albedo)
        total = w_mf + w_lam
        safe = jnp.where(total == 0.0, 1.0, total)
        return w_mf / safe, w_lam / safe

    # bust the module-level jit cache so the patched weights get traced
    monkeypatch.setattr(mesh_mod, "_RENDER_RAYS_JIT", None)
    monkeypatch.setattr(materials, "_selection_weights", mc_selection_weights)
    mc_mean = float(render(11).mean())
    monkeypatch.undo()
    mesh_mod._RENDER_RAYS_JIT = None   # drop the patched executable

    diff = abs(mc_mean - base_mean)
    tol = max(4.0 * seed_sigma, 0.01 * base_mean)
    assert diff < tol, (
        f"MC-weight render mean {mc_mean:.5f} vs table-weight {base_mean:.5f}"
        f" (seed sigma {seed_sigma:.5f})")
