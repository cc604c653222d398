"""The BVH topology knobs (SIMPLEPATH_BVH_WIDTH / SIMPLEPATH_BVH_LEAF)
must keep both traversal paths correct at non-default settings.

The knobs are read at import time (the kernels bake them as Python
constants), so each configuration runs in a subprocess.  The round-5 A/Bs
measured both experimental topologies SLOWER on TPU (PERF.md: K=24 +2.6%,
W=16 +9.7%) — these tests exist so the measurement harness stays sound,
not because either is shipped.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("env", [
    {"SIMPLEPATH_BVH_LEAF": "24"},            # two-row leaves
    {"SIMPLEPATH_BVH_WIDTH": "16"},           # wide nodes, 63-CE sort
])
def test_topology_traversal_correct(env):
    e = dict(os.environ)
    e.update(env)
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x",
         os.path.join(ROOT, "tests", "test_bvh.py"),
         "-k", "bruteforce or anyhit"],
        env=e, capture_output=True, timeout=540, cwd=ROOT)
    assert out.returncode == 0, out.stdout.decode(errors="replace")[-2000:]
