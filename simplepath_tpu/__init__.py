"""simplepath_tpu: a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
kjeffery/SimplePath (an educational C++ CPU path tracer): SoA scene arrays,
branchless material dispatch, flattened wide-BVH traversal, counter-based
RNG, mesh-sharded wavefront rendering, and differentiable rendering w.r.t.
scene parameters.
"""

import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (the reference has no compile step;
    our analog of its instant cold start).  The flagship integrator compiles
    in ~30 s on TPU; with the on-disk cache a repeat invocation — a new CLI
    run, the bench, CI — deserializes in ~1 s.  Opt out with
    SIMPLEPATH_COMPILE_CACHE=0 or point elsewhere via
    JAX_COMPILATION_CACHE_DIR."""
    if _os.environ.get("SIMPLEPATH_COMPILE_CACHE", "1") == "0":
        return
    import jax
    path = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if path is None:
        # repo checkout: cache beside the package (shared by CLI/bench/CI
        # runs of the same tree).  Installed (site-packages) package: fall
        # back to the user cache dir — the package parent may be read-only
        # or shared across projects.
        parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        if _os.path.exists(_os.path.join(parent, ".git")) and \
                _os.access(parent, _os.W_OK):
            path = _os.path.join(parent, ".jax_cache")
        else:
            path = _os.path.join(
                _os.environ.get("XDG_CACHE_HOME",
                                _os.path.expanduser("~/.cache")),
                "simplepath_tpu", "jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # older jax without the knobs: cold compiles only
        pass


_enable_compile_cache()

from .scene.build import build_scene, load_scene
from .scene.parser import parse_sp
from .render.film import render_image, render_rays

__version__ = "0.1.0"
__all__ = ["build_scene", "load_scene", "parse_sp", "render_image", "render_rays"]
