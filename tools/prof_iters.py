"""Count while-loop iterations and isolate body costs for _bvh_closest."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from simplepath_tpu import load_scene
from simplepath_tpu.render.camera import generate_ray
from simplepath_tpu.render import traverse as T

SCENE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scenes", "bunny_bench.sp")

from _prof_util import timeit

N = 65536
scene = load_scene(SCENE)
side = int(np.sqrt(N))
ys, xs = jnp.meshgrid(jnp.arange(side), jnp.arange(side), indexing="ij")
px = (xs.reshape(-1).astype(jnp.float32) + 0.5) * (1024 / side)
py = (ys.reshape(-1).astype(jnp.float32) + 0.5) * (1024 / side)
ro, rd = generate_ray(scene.camera, px, py)
t_min = jnp.zeros(N) + 1e-3
t_max = jnp.full((N,), 3.4e38)

records = scene.bvh.records

def closest_counted(scene, ro, rd, t_min, t_max):
    inv_d = 1.0 / rd
    def cond(state):
        return state[1] > 0
    def body(state):
        stack, sp, best, cnt = state
        ref = T._pop(stack, sp)
        sp = sp - 1
        is_leaf = ref < 0
        rec = records[jnp.abs(ref) - 1]
        cur_t_max = jnp.minimum(t_max, jnp.where(best.valid, best.t, T.INF_DISTANCE))
        packed, n_push = T._visit_internal(rec, is_leaf, ro, inv_d, t_min, cur_t_max)
        t, beta, gamma, valid, tri_idx = T._visit_leaf(rec, ro, rd, t_min, cur_t_max)
        valid = valid & is_leaf
        tm = jnp.where(valid, t, T.INF_DISTANCE)
        j = jnp.argmin(tm)
        cand = T.Hit(valid=valid[j], t=t[j], kind=jnp.asarray(0, jnp.int32),
                     idx=tri_idx[j], beta=beta[j], gamma=gamma[j])
        best = T._closer(best, cand)
        stack, sp = T._push(stack, sp, packed, n_push)
        return stack, sp, best, cnt + 1
    stack0 = jnp.zeros(T.STACK_DEPTH, jnp.int32).at[0].set(1)
    _, _, best, cnt = jax.lax.while_loop(
        cond, body, (stack0, jnp.asarray(1, jnp.int32), T._miss(),
                     jnp.asarray(0, jnp.int32)))
    return best, cnt

f = jax.jit(jax.vmap(lambda o, d, a, b: closest_counted(scene, o, d, a, b)))
(best, cnt) = f(ro, rd, t_min, t_max)
cnt = np.asarray(cnt)
print(f"iterations: max={cnt.max()} mean={cnt.mean():.1f} p99={np.percentile(cnt,99):.0f}")

# body cost with a FIXED iteration count (fori_loop, no per-ray divergence)
def fixed_iters(ro, rd, t_min, t_max, iters, do_gather=True, do_stack=True):
    inv_d = 1.0 / rd
    def body(i, state):
        stack, sp, best = state
        ref = T._pop(stack, sp)
        sp = jnp.maximum(sp - 1, 1)
        is_leaf = ref < 0
        if do_gather:
            rec = records[(jnp.abs(ref) - 1 + i * 131) % records.shape[0]]
        else:
            rec = records[0]
        cur_t_max = jnp.minimum(t_max, jnp.where(best.valid, best.t, T.INF_DISTANCE))
        packed, n_push = T._visit_internal(rec, is_leaf, ro, inv_d, t_min, cur_t_max)
        t, beta, gamma, valid, tri_idx = T._visit_leaf(rec, ro, rd, t_min, cur_t_max)
        tm = jnp.where(valid & is_leaf, t, T.INF_DISTANCE)
        j = jnp.argmin(tm)
        cand = T.Hit(valid=valid[j] & is_leaf, t=t[j], kind=jnp.asarray(0, jnp.int32),
                     idx=tri_idx[j], beta=beta[j], gamma=gamma[j])
        best = T._closer(best, cand)
        if do_stack:
            stack, sp = T._push(stack, sp, packed, n_push)
        else:
            sp = sp + (n_push > 100)
        return stack, sp, best
    stack0 = jnp.zeros(T.STACK_DEPTH, jnp.int32).at[0].set(1)
    _, _, best = jax.lax.fori_loop(0, iters, body, (stack0, jnp.asarray(1, jnp.int32), T._miss()))
    return best

ITERS = 100
for (g, s, label) in [(True, True, "gather+stack"), (True, False, "gather only"),
                      (False, True, "stack only"), (False, False, "neither")]:
    fn = jax.jit(jax.vmap(lambda o, d, a, b: fixed_iters(o, d, a, b, ITERS, g, s)))
    dt = timeit(fn, ro, rd, t_min, t_max, vary=2)
    print(f"{label:13s}: {dt/ITERS*1e6:8.1f} us/iter ({dt*1e3:.1f} ms / {ITERS} iters)")
