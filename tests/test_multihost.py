"""Multi-process rendering: 2 CPU processes must produce the 1-process image.

Spawns two subprocesses that jax.distributed.initialize against a local
coordinator (each contributing 2 virtual CPU devices → a 4-device global
"rays" mesh), render via parallel.multihost.render_image_multihost, and
checks the gathered film equals a plain single-process render_image — same
sample streams, only the device partition differs.  This is the fake-backend
distributed test the reference has no analog for (SURVEY §4/§5).
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCENE = """version: 1

scene_parameters {
    output_file_name: "mh.pfm"
    width: 24
    height: 16
    max_depth: 3
    integrator: iterative_rrnee
}

perspective_camera {
    origin: 0.0 2.0 5.0
    look_at: 0.0 1.0 0.0
    fov: 45
}

material_lambertian {
    name: "blue"
    diffuse: 0.2 0.3 0.7
}

sphere {
    translate: 0.0 1.0 0.0
    material: "blue"
}

plane {
    material: "blue"
}

sphere_light {
    translate: 0.0 4.0 0.0
    radiance: 10.0 10.0 10.0
}
"""

WORKER = r"""
import os, sys
pid = int(sys.argv[1])
addr = sys.argv[2]
out = sys.argv[3]
root = sys.argv[4]
sys.path.insert(0, root)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
# initialize BEFORE importing simplepath_tpu (whose module-level jnp
# constants would initialize the XLA backend)
jax.distributed.initialize(coordinator_address=addr, num_processes=2,
                           process_id=pid, shutdown_timeout_seconds=900)
# (default shutdown barrier is 300 s; on the 2-vCPU CI host a worker's
# independent compile can lag its sibling past that under load)
from simplepath_tpu.parallel.multihost import render_image_multihost
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
from simplepath_tpu import build_scene, parse_sp
scene = build_scene(parse_sp(open(os.path.join(out, "scene.sp")).read()))
img = render_image_multihost(scene, spp=2, key=jax.random.PRNGKey(0))
import numpy as np
np.save(os.path.join(out, f"img_{pid}.npy"), img)
# chunked path (3 chunks of 128 rays over the 384-pixel frame) must compose
# to the identical film — this is how lucy/elf-class frames stay in memory
img_c = render_image_multihost(scene, spp=2, key=jax.random.PRNGKey(0),
                               chunk_rays=32)
np.save(os.path.join(out, f"img_chunked_{pid}.npy"), img_c)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_render_matches_single_process():
    # (no pytest-timeout plugin on this rig; the communicate(timeout=560)
    # below is the real watchdog)
    with tempfile.TemporaryDirectory() as td:
        with open(os.path.join(td, "scene.sp"), "w") as f:
            f.write(SCENE)
        with open(os.path.join(td, "worker.py"), "w") as f:
            f.write(WORKER)
        addr = f"localhost:{_free_port()}"
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [subprocess.Popen(
            [sys.executable, os.path.join(td, "worker.py"), str(pid), addr,
             td, ROOT],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for pid in (0, 1)]
        outs = [p.communicate(timeout=560)[0] for p in procs]
        for p, o in zip(procs, outs):
            assert p.returncode == 0, o.decode(errors="replace")[-2000:]

        img0 = np.load(os.path.join(td, "img_0.npy"))
        img1 = np.load(os.path.join(td, "img_1.npy"))
        # both processes gather the same full film
        np.testing.assert_array_equal(img0, img1)

        # ray-chunked multihost render composes to the same film
        img0c = np.load(os.path.join(td, "img_chunked_0.npy"))
        img1c = np.load(os.path.join(td, "img_chunked_1.npy"))
        np.testing.assert_array_equal(img0c, img1c)
        np.testing.assert_allclose(img0c, img0, atol=2e-6)

        # equals the single-process render
        import jax

        from simplepath_tpu import build_scene, parse_sp, render_image
        scene = build_scene(parse_sp(SCENE))
        ref = np.asarray(render_image(scene, spp=2, key=jax.random.PRNGKey(0)))
        np.testing.assert_allclose(img0, ref, atol=2e-6)


TRAIN_SCENE = """version: 1

scene_parameters {
    output_file_name: "mht.pfm"
    width: 8
    height: 8
    max_depth: 3
    integrator: iterative_rrnee
}

perspective_camera {
    origin: 0.0 2.0 5.0
    look_at: 0.0 1.0 0.0
    fov: 45
}

material_lambertian {
    name: "red"
    diffuse: 0.6 0.2 0.2
}

material_lambertian {
    name: "grey"
    diffuse: 0.5 0.5 0.5
}

mesh {
    file: "ico.ply"
    translate: 0.0 1.0 0.0
    material: "red"
}

plane {
    material: "grey"
}

sphere_light {
    translate: 0.0 4.0 0.0
    radiance: 10.0 10.0 10.0
}
"""

TRAIN_WORKER = r"""
import os, sys
pid = int(sys.argv[1])
addr = sys.argv[2]
out = sys.argv[3]
root = sys.argv[4]
sys.path.insert(0, root)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=addr, num_processes=2,
                           process_id=pid, shutdown_timeout_seconds=900)
# (default shutdown barrier is 300 s; on the 2-vCPU CI host a worker's
# independent compile can lag its sibling past that under load)
import numpy as np
from simplepath_tpu import build_scene, parse_sp
from simplepath_tpu.diff.grad import get_params
from simplepath_tpu.parallel.multihost import train_step_multihost
assert jax.process_count() == 2 and len(jax.devices()) == 4
scene = build_scene(parse_sp(open(os.path.join(out, "scene.sp")).read(),
                             base_dir=out))
assert scene.static.has_bvh and scene.static.num_triangles == 80
params = get_params(scene)
n = 8 * 8
xs = np.arange(n, dtype=np.int32) % 8
ys = np.arange(n, dtype=np.int32) // 8
target = np.full((n, 3), 0.25, np.float32)
new_params, loss = train_step_multihost(
    scene, params, target, xs, ys, spp=2, key=jax.random.PRNGKey(4))
np.savez(os.path.join(out, f"train_{pid}.npz"), loss=np.float32(loss),
         **{k: np.asarray(v) for k, v in new_params.items()})
"""


def test_two_process_train_step_matches_single_process(tmp_path):
    """One gradient step on a mesh+BVH scene with the pixel batch sharded
    across TWO processes: the scene-parameter gradient psum executes over
    the process boundary (the north-star distributed-training axis), and
    the updated params must equal the single-process train step."""
    import os

    from simplepath_tpu.io.meshgen import icosphere, write_ply

    td = str(tmp_path)
    v, f = icosphere(1)
    write_ply(os.path.join(td, "ico.ply"), v.astype(np.float32), f)
    with open(os.path.join(td, "scene.sp"), "w") as fh:
        fh.write(TRAIN_SCENE)
    with open(os.path.join(td, "worker.py"), "w") as fh:
        fh.write(TRAIN_WORKER)
    addr = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(td, "worker.py"), str(pid), addr,
         td, ROOT],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-2000:]

    z0 = np.load(os.path.join(td, "train_0.npz"))
    z1 = np.load(os.path.join(td, "train_1.npz"))
    # both processes compute the identical update (replicated params)
    for k in z0.files:
        np.testing.assert_array_equal(z0[k], z1[k])

    # equals the single-process train step (same batch, same key; only the
    # device partition of the mean-reduction differs -> fp-level tolerance)
    import jax

    from simplepath_tpu import build_scene, parse_sp
    from simplepath_tpu.diff.grad import get_params, make_train_step
    scene = build_scene(parse_sp(TRAIN_SCENE, base_dir=td))
    params = get_params(scene)
    n = 8 * 8
    xs = np.arange(n, dtype=np.int32) % 8
    ys = np.arange(n, dtype=np.int32) // 8
    target = np.full((n, 3), 0.25, np.float32)
    step = jax.jit(make_train_step(scene, spp=2))
    ref_params, ref_loss = step(params, target, xs, ys, jax.random.PRNGKey(4))
    np.testing.assert_allclose(float(z0["loss"]), float(ref_loss), rtol=1e-5)
    for k, v in ref_params.items():
        np.testing.assert_allclose(z0[k], np.asarray(v), atol=1e-5,
                                   err_msg=k)
    # and the step moved the params (a real gradient, not a zero no-op)
    assert np.abs(z0["mat_albedo"] - np.asarray(params["mat_albedo"])).max() > 1e-6


GEOM_WORKER = r"""
import os, sys
pid = int(sys.argv[1])
addr = sys.argv[2]
out = sys.argv[3]
root = sys.argv[4]
sys.path.insert(0, root)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=addr, num_processes=2,
                           process_id=pid, shutdown_timeout_seconds=900)
# (default shutdown barrier is 300 s; on the 2-vCPU CI host a worker's
# independent compile can lag its sibling past that under load)
import numpy as np
from jax.sharding import Mesh
from simplepath_tpu import load_scene
from simplepath_tpu.parallel.geom_shard import (GEOM_AXIS,
                                                render_image_geom_sharded,
                                                shard_scene_geometry)
assert jax.process_count() == 2 and len(jax.devices()) == 4
scene_path = os.path.join(root, "tests", "scenes", "g_blob.sp")
mesh = Mesh(np.asarray(jax.devices()), (GEOM_AXIS,))
scene = shard_scene_geometry(load_scene(scene_path, use_bvh=False), mesh)
# each process holds only ITS 2 of the 4 forest shards
assert not scene.bvh.records.is_fully_addressable
assert len(scene.bvh.records.addressable_shards) == 2
img = render_image_geom_sharded(scene, spp=2, key=jax.random.PRNGKey(11),
                                mesh=mesh)
np.save(os.path.join(out, f"geom_{pid}.npy"), img)

# the 2-D production layout: pixel chunks sharded over RAY_AXIS (one ray
# block per process here), forest over GEOM_AXIS; two chunks exercise the
# cross-process film gather
from simplepath_tpu.parallel.geom_shard import make_geom_mesh
mesh2 = make_geom_mesh(2, 2)
scene2 = shard_scene_geometry(load_scene(scene_path, use_bvh=False), mesh2)
img2 = render_image_geom_sharded(scene2, spp=2, key=jax.random.PRNGKey(11),
                                 mesh=mesh2, chunk_rays=1152)
np.save(os.path.join(out, f"geom2d_{pid}.npy"), img2)
"""


def test_two_process_geometry_sharding_matches_replicated(tmp_path):
    """The forest sharded ACROSS PROCESSES: 4 sub-BVHs over 2 hosts' 2+2
    devices, min-t combine riding the (virtual) DCN.  Both processes must
    assemble the same film, equal to the single-process replicated render
    (same gate as the in-process geom tests)."""
    import os

    td = str(tmp_path)
    with open(os.path.join(td, "worker.py"), "w") as fh:
        fh.write(GEOM_WORKER)
    addr = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(td, "worker.py"), str(pid), addr,
         td, ROOT],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-2000:]

    img0 = np.load(os.path.join(td, "geom_0.npy"))
    img1 = np.load(os.path.join(td, "geom_1.npy"))
    np.testing.assert_array_equal(img0, img1)
    img2_0 = np.load(os.path.join(td, "geom2d_0.npy"))
    img2_1 = np.load(os.path.join(td, "geom2d_1.npy"))
    np.testing.assert_array_equal(img2_0, img2_1)

    import jax

    from simplepath_tpu import load_scene
    from simplepath_tpu.parallel.mesh import render_image_sharded
    ref = np.asarray(render_image_sharded(
        load_scene(os.path.join(ROOT, "tests", "scenes", "g_blob.sp")),
        spp=2, key=jax.random.PRNGKey(11)))
    assert np.max(np.abs(img0 - ref)) < 1e-4, np.max(np.abs(img0 - ref))
    assert np.max(np.abs(img2_0 - ref)) < 1e-4, np.max(np.abs(img2_0 - ref))
