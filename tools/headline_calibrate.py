"""Calibrate the headline parity gate from a measured noise floor.

Renders the headline scene (512^2 @ 512 spp, the golden's exact config,
tests/golden/manifest.json "g_headline") TWICE with independent RNG keys,
then reports:

* ours(keyA) vs ours(keyB)  -- the self-noise floor: two independent MC
  estimates of the same integral, so any ref-vs-ours metric value at or
  below this floor is indistinguishable from matched-estimator noise.
* ours(keyA) vs golden      -- the actual parity gap.

Metrics computed for each pair (mirrors tests/test_golden_parity.py):
  rel_mean, unblurred p99 rel err, blurred(3x3) p99,
  firefly-symmetric p99 (excluding the UNION of each image's brightest
  0.05% pixels -- the scene's 0.01-roughness glossy plane + small sphere
  light makes heavy-tailed fireflies on BOTH sides, ref golden included).

Renders are cached as .npy next to the goldens so re-analysis is free.

Usage: python tools/headline_calibrate.py [--force]
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402

from simplepath_tpu import load_scene  # noqa: E402
from simplepath_tpu.io.pfm import read_pfm  # noqa: E402

GOLDEN = os.path.join(ROOT, "tests", "golden")
CACHE = os.path.join(ROOT, "tests", "golden", "headline_cache")


def render_full(scene, spp, key, ckpt_path, step=32):
    """Renders in spp passes with absolute sample offsets; checkpoints the
    running sum after every pass so an interrupted run resumes."""
    from simplepath_tpu.parallel.mesh import render_image_sharded
    h, w = scene.static.height, scene.static.width
    img = np.zeros((h, w, 3), np.float64)
    s_start = 0
    if os.path.exists(ckpt_path):
        d = np.load(ckpt_path)
        img, s_start = d["img"], int(d["s0"])
        print(f"  resuming from pass {s_start}", flush=True)
    for s0 in range(s_start, spp, step):
        cnt = min(step, spp - s0)  # last pass may be short; weight by cnt
        t0 = time.time()
        part = render_image_sharded(scene, spp=cnt, key=key, spp_offset=s0)
        part = np.asarray(part, np.float64)
        img += part * (cnt / spp)
        np.savez(ckpt_path, img=img, s0=s0 + cnt)
        print(f"  pass {s0:4d}+{cnt}: {time.time()-t0:.1f}s", flush=True)
    return img.astype(np.float32)


def box3(img):
    p = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    out = np.zeros_like(img)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out += p[dy:dy + img.shape[0], dx:dx + img.shape[1]]
    return out / 9.0


def metrics(a, b, label):
    """a = reference-side image, b = ours-side image."""
    mean_a, mean_b = float(a.mean()), float(b.mean())
    rel_mean = abs(mean_b - mean_a) / max(mean_a, 1e-6)

    def p99_rel(x, y):
        scale = np.maximum(x.mean(axis=2), 0.05 * max(float(x.mean()), 1e-3))
        rel = np.abs(x - y).mean(axis=2) / scale
        return float(np.percentile(rel, 99)), rel

    p99, rel = p99_rel(a, b)
    bp99, _ = p99_rel(box3(a), box3(b))
    p50 = float(np.percentile(rel, 50))
    p90 = float(np.percentile(rel, 90))

    # firefly-symmetric: drop the union of each image's top-0.05% pixels
    # (by per-pixel mean radiance) before taking the percentile
    la, lb = a.mean(axis=2), b.mean(axis=2)
    qa = np.quantile(la, 0.9995)
    qb = np.quantile(lb, 0.9995)
    keep = (la < qa) & (lb < qb)
    ff_p99 = float(np.percentile(rel[keep], 99))

    out = {"label": label, "rel_mean": rel_mean, "p50": p50, "p90": p90,
           "p99": p99, "blur_p99": bp99, "firefly_sym_p99": ff_p99,
           "n_excluded": int((~keep).sum())}
    print(json.dumps(out), flush=True)
    return out


def main():
    force = "--force" in sys.argv
    os.makedirs(CACHE, exist_ok=True)
    with open(os.path.join(GOLDEN, "manifest.json")) as f:
        info = json.load(f)["g_headline"]
    spp = info["spp"]

    scene = load_scene(os.path.join(ROOT, info["scene"]))
    print(f"scene loaded; backend={jax.default_backend()}", flush=True)

    imgs = {}
    for name, seed in (("k3", 3), ("k1003", 1003)):
        path = os.path.join(CACHE, f"ours_{name}_{spp}spp.npy")
        if os.path.exists(path) and not force:
            imgs[name] = np.load(path)
            print(f"loaded cached {path}", flush=True)
            continue
        print(f"rendering {name} (seed {seed}) @ {spp}spp ...", flush=True)
        t0 = time.time()
        ckpt = os.path.join(CACHE, f"ours_{name}_{spp}spp.ckpt.npz")
        img = render_full(scene, spp, jax.random.PRNGKey(seed), ckpt)
        print(f"done in {time.time()-t0:.0f}s", flush=True)
        np.save(path, img)
        imgs[name] = img

    ref = read_pfm(os.path.join(GOLDEN, "g_headline.pfm"))

    results = [
        metrics(imgs["k3"], imgs["k1003"], "ours_vs_ours (self-noise floor)"),
        metrics(ref, imgs["k3"], "ref_vs_ours_k3"),
        metrics(ref, imgs["k1003"], "ref_vs_ours_k1003"),
    ]
    with open(os.path.join(CACHE, "calibration.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", os.path.join(CACHE, "calibration.json"), flush=True)


if __name__ == "__main__":
    main()
