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


@pytest.mark.parametrize("name", sorted(
    n for n in MANIFEST if MANIFEST[n].get("tier") is None))
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


# ---------------------------------------------------------------- headline

ROOT = os.path.dirname(HERE)

# The 512^2 spp-MATCHED headline comparison renders 134M paths on our side —
# minutes on a TPU chip, hours on the CI CPU mesh — so it runs only on TPU
# or when explicitly requested (SIMPLEPATH_HEADLINE=1).
_HEADLINE_ON = (os.environ.get("SIMPLEPATH_HEADLINE") == "1"
                or jax.default_backend() == "tpu")


@pytest.mark.skipif("g_headline" not in MANIFEST, reason="no headline golden")
@pytest.mark.skipif(not _HEADLINE_ON,
                    reason="headline tier runs on TPU or SIMPLEPATH_HEADLINE=1")
def test_headline_spp_matched():
    """Headline-config parity (round-2 VERDICT task 4): the bunny-class
    bench scene at 512x512 with OUR spp equal to the golden's, compared
    UNBLURRED per pixel.  At matched spp the only gap is independent-stream
    MC noise, so per-pixel tolerances are tight: p99 relative error < 10%,
    image mean within 1%."""
    from simplepath_tpu.parallel.mesh import render_image_sharded

    info = MANIFEST["g_headline"]
    ref = read_pfm(os.path.join(GOLDEN, "g_headline.pfm"))
    scene = load_scene(os.path.join(ROOT, info["scene"]))
    # render in spp passes (absolute sample offsets → identical to one
    # uninterrupted render); a single >2-minute dispatch can trip tunnel
    # timeouts on this rig
    step, total = 32, info["spp"]
    img = np.zeros(ref.shape, np.float64)
    for s0 in range(0, total, step):
        part = render_image_sharded(scene, spp=step,
                                    key=jax.random.PRNGKey(3), spp_offset=s0)
        img += np.asarray(part, np.float64) * (step / total)
    img = img.astype(np.float32)
    assert img.shape == ref.shape

    mean_ref, mean_ours = float(ref.mean()), float(img.mean())
    rel_mean = abs(mean_ours - mean_ref) / mean_ref
    assert rel_mean < 0.01, f"mean: ref={mean_ref:.5f} ours={mean_ours:.5f}"

    scale = np.maximum(ref.mean(axis=2), 0.05 * mean_ref)
    rel = np.abs(ref - img).mean(axis=2) / scale
    p99 = float(np.percentile(rel, 99))
    assert p99 < 0.10, f"unblurred p99 relative error {p99:.4f}"
