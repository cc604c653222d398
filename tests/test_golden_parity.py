"""Golden-image parity vs the reference C++ renderer.

Each golden in tests/golden/ was rendered by the reference binary (see
tools/make_goldens.py).  Our renders use different RNG streams for all
stochastic decisions, so parity is statistical:

* overall image mean within a few percent (tight — spp is high),
* per-pixel agreement after a 3x3 box blur (absorbs MC noise),
* deterministic integrators (mandelbrot) match to float tolerance.

This is the golden/integration tier the reference lacks (SURVEY §4) —
its de-facto integration test was eyeballing PFMs.
"""

import json
import os

import jax
import numpy as np
import pytest

from simplepath_tpu import load_scene, render_image
from simplepath_tpu.io.pfm import read_pfm

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")
SCENES = os.path.join(HERE, "scenes")

with open(os.path.join(GOLDEN, "manifest.json")) as f:
    MANIFEST = json.load(f)


def box3(img):
    """3x3 box blur via cumulative sums (numpy)."""
    p = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    out = np.zeros_like(img)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out += p[dy:dy + img.shape[0], dx:dx + img.shape[1]]
    return out / 9.0


OUR_SPP_CAP = 32  # goldens are 128-256spp; our side needs less for the
                  # statistical comparison and CI time matters


def render_ours(name, spp):
    scene = load_scene(os.path.join(SCENES, name + ".sp"))
    # the IBL scenes concentrate radiance in a 3x2-texel sun, so per-pixel
    # estimates need more samples for the blurred comparison to stabilize
    cap = 128 if "ibl" in name else OUR_SPP_CAP
    img = render_image(scene, spp=min(spp, cap), key=jax.random.PRNGKey(17))
    return np.asarray(img)


@pytest.mark.parametrize("name", sorted(MANIFEST.keys()))
def test_golden(name):
    info = MANIFEST[name]
    ref = read_pfm(os.path.join(GOLDEN, name + ".pfm"))
    ours = render_ours(name, info["spp"])
    assert ours.shape == ref.shape

    if info["integrator"] == "mandelbrot":
        # deterministic, but escape-boundary pixels can flip an iteration
        # (±1) under different fma contraction — require 99% exact-ish
        close = np.abs(ours - ref).max(axis=2) < 2e-3
        assert close.mean() > 0.99, f"only {close.mean():.4f} pixels match"
        return

    mean_ref = float(ref.mean())
    mean_ours = float(ours.mean())
    rel_mean = abs(mean_ours - mean_ref) / max(mean_ref, 1e-6)
    assert rel_mean < 0.05, f"mean mismatch: ref={mean_ref} ours={mean_ours}"

    # blurred per-pixel comparison: 90th percentile relative error
    bref, bours = box3(ref), box3(ours)
    scale = np.maximum(bref.mean(axis=2), 0.05 * max(mean_ref, 1e-3))
    rel = np.abs(bref - bours).mean(axis=2) / scale
    p90 = float(np.percentile(rel, 90))
    assert p90 < 0.35, f"blurred p90 relative error {p90:.3f}"
