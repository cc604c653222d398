"""Measure XLA TPU gather throughput vs row width / table size / index order."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

def timeit(fn, *args, n=5):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / n

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
        dt = timeit(g, idx) / 20
        gbps = N * W * 4 / dt / 1e9
        dt2 = timeit(g, idx_sorted) / 20
        gbps2 = N * W * 4 / dt2 / 1e9
        print(f"W={W:5d} M={M:6d}: rand {dt*1e6:8.1f} us/iter {gbps:7.1f} GB/s"
              f" | sorted {gbps2:7.1f} GB/s")
