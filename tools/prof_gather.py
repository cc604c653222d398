"""Measure XLA TPU gather throughput vs row width / table size / index order."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from _prof_util import timeit


def vary_idx(i, args):
    # roll the index array per iteration so the tunnel can't memoize
    return (jnp.roll(args[0], i) + i,) + args[1:]

N = 65536
for W in [8, 64, 128, 256, 512, 1024]:
    for M in [1024, 16384, 131072]:
        tbl = jnp.ones((M, W), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, M)
        idx_sorted = jnp.sort(idx)
        @jax.jit
        def g(i):
            def body(k, acc):
                return acc + tbl[(i + k * 7919) % M].sum(axis=-1)
            return jax.lax.fori_loop(0, 20, body, jnp.zeros((N,)))
        dt = timeit(g, idx, vary_fn=vary_idx, iters=5) / 20
        gbps = N * W * 4 / dt / 1e9
        dt2 = timeit(g, idx_sorted, vary_fn=vary_idx, iters=5) / 20
        gbps2 = N * W * 4 / dt2 / 1e9
        print(f"W={W:5d} M={M:6d}: rand {dt*1e6:8.1f} us/iter {gbps:7.1f} GB/s"
              f" | sorted {gbps2:7.1f} GB/s")
