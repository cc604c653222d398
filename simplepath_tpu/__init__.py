"""simplepath_tpu: a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
kjeffery/SimplePath (an educational C++ CPU path tracer): SoA scene arrays,
branchless material dispatch, flattened wide-BVH traversal, counter-based
RNG, mesh-sharded wavefront rendering, and differentiable rendering w.r.t.
scene parameters.
"""

from .scene.build import build_scene, load_scene
from .scene.parser import parse_sp
from .render.film import render_image, render_rays

__version__ = "0.1.0"
__all__ = ["build_scene", "load_scene", "parse_sp", "render_image", "render_rays"]
