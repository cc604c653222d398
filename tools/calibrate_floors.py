#!/usr/bin/env python3
"""Regenerate tests/golden/matched_floors.json — the per-scene self-noise
floors gating the matched-spp golden tier (VERDICT r4 task 6: the floors
must be reproducible from the repo, not from a snippet in git history).

Method (the same calibration the headline tier uses,
tools/headline_calibrate.py): render each golden scene TWICE at the
golden's exact spp with independent RNG keys.  Two such renders are
independent Monte-Carlo estimates of the same integral by the same
estimator, so their error percentiles are the floor below which a
ref-vs-ours comparison is indistinguishable from matched-estimator noise.
tests/test_golden_parity.py::test_golden_matched_spp gates ref-vs-ours at
1.5x these floors (plus a tight absolute mean).

Scene selection: every stochastic golden EXCEPT
  * g_mandel          — deterministic, exact-pixel tier;
  * g_ibl, g_ibl_rrnee, g_combo_ibl — the IBL scenes concentrate radiance
    in a 3x2-texel sun, so unblurred per-pixel estimates are dominated by
    whether a light-sample lands in the sun texel; their cross-key floor is
    so high the matched gate would be vacuous.  They keep the blurred-p90
    tier (test_golden) which absorbs exactly that noise;
  * g_headline        — its own calibrated tier (headline_calibrate.py).

Usage:  python tools/calibrate_floors.py [scene ...]
Naming a subset recalibrates only those scenes (the rest pass through).
The metric math mirrors test_golden_matched_spp exactly.
"""

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402

from simplepath_tpu import load_scene, render_image  # noqa: E402

GOLDEN = os.path.join(ROOT, "tests", "golden")
SCENES = os.path.join(ROOT, "tests", "scenes")
FLOORS = os.path.join(GOLDEN, "matched_floors.json")

EXCLUDED = {"g_mandel", "g_ibl", "g_ibl_rrnee", "g_combo_ibl", "g_headline"}
KEYS = (101, 202)  # independent; both differ from the test's render key (17)


def floor_metrics(a: np.ndarray, b: np.ndarray) -> dict:
    """Mirrors test_golden_matched_spp's comparison with a as 'ref'."""
    mean_a = float(a.mean())
    rel_mean = abs(float(b.mean()) - mean_a) / max(mean_a, 1e-6)
    scale = np.maximum(a.mean(axis=2), 0.05 * max(mean_a, 1e-3))
    rel = np.abs(a - b).mean(axis=2) / scale
    return {"rel_mean": rel_mean,
            "p90": float(np.percentile(rel, 90)),
            "p99": float(np.percentile(rel, 99))}


def main(argv):
    with open(os.path.join(GOLDEN, "manifest.json")) as f:
        manifest = json.load(f)
    all_names = sorted(n for n in manifest
                       if manifest[n].get("tier") is None and n not in EXCLUDED)
    names = [n for n in argv if not n.startswith("-")] or all_names
    unknown = set(names) - set(all_names)
    if unknown:
        raise SystemExit(f"not calibratable scenes: {sorted(unknown)} "
                         f"(choose from {all_names})")

    floors = {}
    if names != all_names:
        if not os.path.exists(FLOORS):
            raise SystemExit(
                "recalibrating a subset requires an existing "
                f"{FLOORS} to merge into — run with no arguments first")
        with open(FLOORS) as f:
            floors = json.load(f)

    for name in names:
        info = manifest[name]
        scene = load_scene(os.path.join(SCENES, name + ".sp"))
        imgs = []
        for k in KEYS:
            print(f"{name}: rendering {info['spp']} spp (key {k}) ...",
                  flush=True)
            imgs.append(np.asarray(render_image(
                scene, spp=info["spp"], key=jax.random.PRNGKey(k))))
        floors[name] = floor_metrics(*imgs)
        print(f"{name}: {floors[name]}", flush=True)

    with open(FLOORS, "w") as f:
        json.dump({k: floors[k] for k in sorted(floors)}, f, indent=1)
        f.write("\n")
    print(f"wrote {FLOORS} ({len(floors)} scenes)")


if __name__ == "__main__":
    main(sys.argv[1:])
