"""Shared timing helper for the prof_* tools.

The TPU on this rig is reached through a tunnel that MEMOIZES identical
dispatches: re-running a jitted function on the same argument buffers can
return a cached result in ~0.1 ms instead of executing (PERF.md
"Measurement gotchas").  Every timing loop must therefore vary at least one
input per iteration; this helper enforces that and sanity-checks the
resulting timings for memoization (a cached iteration is ~100x faster than
a real one).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _jitter_arg(args: tuple, idx: int, i: int) -> tuple:
    a = list(args)
    a[idx] = a[idx] + jnp.asarray(i * 1e-6, a[idx].dtype)
    return tuple(a)


def timeit(fn, *args, iters: int = 3, vary: int | None = None,
           vary_fn=None) -> float:
    """Mean seconds/call of ``fn`` over ``iters`` calls with VARIED inputs.

    Exactly one of:
      vary     — positional index of a float array argument to perturb by
                 i*1e-6 per iteration (harmless for t_min/t_max-style args);
      vary_fn  — callable (i, args) -> args producing iteration i's
                 arguments (use for keys, index arrays, pytrees).

    The first (i=0) call warms up / compiles and is not timed.  Raises
    RuntimeError if the timings spread >50x, the memoized-dispatch
    signature.
    """
    if (vary is None) == (vary_fn is None):
        raise ValueError("pass exactly one of vary= or vary_fn=")
    make = (lambda i: _jitter_arg(args, vary, i)) if vary_fn is None \
        else (lambda i: vary_fn(i, args))

    jax.block_until_ready(fn(*make(0)))
    times = []
    for i in range(1, iters + 1):
        a = make(i)
        jax.block_until_ready(a)
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    if len(times) > 1 and max(times) > 50 * min(times) and min(times) < 2e-3:
        raise RuntimeError(
            f"timings {['%.4f' % t for t in times]} look memoized "
            "(one iteration ~free): inputs are not actually varying")
    return sum(times) / len(times)


def vary_keys(key_arg_idx: int):
    """vary_fn that fold_in's the iteration index into a key array arg."""
    def fn(i, args):
        a = list(args)
        k = a[key_arg_idx]
        if k.ndim == 0 or (k.ndim == 1 and k.shape[0] == 2):
            a[key_arg_idx] = jax.random.fold_in(k, i)
        else:
            a[key_arg_idx] = jax.vmap(jax.random.fold_in,
                                      in_axes=(0, None))(k, i)
        return tuple(a)
    return fn
