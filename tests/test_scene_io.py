"""Scene parser, mesh loaders, image IO, and aux-subsystem tests."""

import io
import os
import tempfile

import numpy as np
import pytest

from simplepath_tpu import parse_sp
from simplepath_tpu.io.meshgen import displaced_blob, icosphere, write_ply, write_stl
from simplepath_tpu.io.pfm import read_pfm, write_pfm
from simplepath_tpu.scene.parser import ParsingError
from simplepath_tpu.scene.ply import bake_mesh, read_ply
from simplepath_tpu.scene.stl import read_stl
from simplepath_tpu.utils import (AccumulatedLogHandler, ProgressBar,
                                  RunningStats, load_checkpoint,
                                  save_checkpoint)


class TestParser:
    def test_four_pass_order(self):
        # clearcoat referencing a material declared LATER in the file works
        # (pass 2 runs after pass 1 — FileParser.cpp:903-911)
        ps = parse_sp("""version: 1
material_clearcoat {
    name: "cc"
    base: "later"
}
material_lambertian {
    name: "later"
    diffuse: 0.5 0.5 0.5
}
""")
        assert ps.materials["cc"].base == "later"

    def test_transform_order(self):
        # translate then scale: fwd = T∘S (scale applied to object first)
        ps = parse_sp("""version: 1
material_lambertian {
    name: "m"
    diffuse: 0.5 0.5 0.5
}
sphere {
    translate: 1.0 2.0 3.0
    scale: 2.0 2.0 2.0
    material: "m"
}
""")
        lin, t = ps.geometry[0].transform
        np.testing.assert_allclose(lin, np.diag([2.0, 2.0, 2.0]))
        np.testing.assert_allclose(t, [1.0, 2.0, 3.0])
        ilin, it = ps.geometry[0].inverse
        # inverse round trip
        p = np.array([0.3, 0.5, -0.2])
        world = lin @ p + t
        back = ilin @ world + it
        np.testing.assert_allclose(back, p, atol=1e-6)

    def test_comments_and_line_numbers(self):
        src = """version: 1
# a comment
material_lambertian {
    name: "m"   # trailing comment
    diffuse: 0.5 0.5 0.5
    oops: 1
}
"""
        with pytest.raises(ParsingError, match="line 6"):
            parse_sp(src)

    def test_duplicate_material_rejected(self):
        src = """version: 1
material_lambertian {
    name: "m"
    diffuse: 0.5 0.5 0.5
}
material_lambertian {
    name: "m"
    diffuse: 0.1 0.1 0.1
}
"""
        with pytest.raises(ParsingError, match="already exists"):
            parse_sp(src)

    def test_stubs_warn_not_fail(self):
        ps = parse_sp("""version: 1
instance {
    geometry: "x"
}
material_transmissive_dielectric {
    name: "t"
    ior: 1.3
}
""")
        assert ps.geometry == [] and ps.materials == {}

    def test_defaults(self):
        ps = parse_sp("version: 1\n")
        assert (ps.width, ps.height) == (512, 512)  # FileParser.cpp:256-257
        assert ps.max_depth == 10 and ps.russian_roulette_depth == 3
        assert ps.integrator is None  # NotSpecified


class TestMeshIO:
    def test_ply_roundtrip(self, tmp_path):
        v, f = icosphere(2)
        p = tmp_path / "m.ply"
        write_ply(p, v, f)
        mesh = read_ply(p)
        np.testing.assert_allclose(mesh.vertices, v, atol=1e-6)
        np.testing.assert_array_equal(mesh.indices, f)
        # vertex normals of a sphere ≈ positions
        cos = np.sum(mesh.normals * v / np.linalg.norm(v, axis=1, keepdims=True),
                     axis=1)
        assert (cos > 0.95).all()

    def test_stl_roundtrip_dedup(self, tmp_path):
        v, f = icosphere(1)
        p = tmp_path / "m.stl"
        write_stl(p, v, f)
        mesh = read_stl(p)
        assert len(mesh.vertices) == len(v)       # dedup reconstructs verts
        assert len(mesh.indices) == len(f)
        tri_ref = np.sort(v[f].reshape(-1, 3), axis=0)
        tri_got = np.sort(mesh.vertices[mesh.indices].reshape(-1, 3), axis=0)
        np.testing.assert_allclose(tri_got, tri_ref, atol=1e-6)

    def test_bake_transforms_normals_with_linear(self):
        v, f = icosphere(1)
        from simplepath_tpu.scene.ply import MeshData
        mesh = read_like = MeshData(f, v.astype(np.float32),
                                    (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32))
        lin = np.diag([2.0, 1.0, 1.0]).astype(np.float32)
        baked = bake_mesh(mesh, lin, np.zeros(3, np.float32))
        # reference quirk: normals transformed by plain linear matrix, not
        # inverse transpose, and not renormalized
        np.testing.assert_allclose(baked.normals, mesh.normals @ lin.T, atol=1e-6)


class TestPfm:
    def test_roundtrip(self, tmp_path):
        img = np.random.RandomState(0).rand(7, 5, 3).astype(np.float32)
        p = tmp_path / "i.pfm"
        write_pfm(p, img)
        np.testing.assert_array_equal(read_pfm(p), img)


class TestAux:
    def test_running_stats(self):
        rs = RunningStats()
        data = [1.0, 2.0, 3.0, 4.0]
        for x in data:
            rs.push(x)
        assert rs.mean() == pytest.approx(2.5)
        assert rs.variance() == pytest.approx(np.var(data, ddof=1))

    def test_accumulated_log_dedup(self, capsys):
        import logging
        stream = io.StringIO()
        h = AccumulatedLogHandler(stream=stream, flush_interval=10.0)
        log = logging.Logger("t")
        log.addHandler(h)
        for _ in range(5):
            log.warning("zero-area face")
        log.warning("other")
        h.flush_accumulated()
        out = stream.getvalue()
        assert "zero-area face (x5)" in out
        assert "other" in out and "other (x" not in out

    def test_checkpoint_roundtrip(self, tmp_path):
        film = np.random.rand(16, 3).astype(np.float32)
        p = str(tmp_path / "ck.npz")
        save_checkpoint(p, film, 42, {"spp_target": 64})
        f2, n, meta = load_checkpoint(p)
        np.testing.assert_array_equal(f2, film)
        assert n == 42 and meta["spp_target"] == 64


class TestGeometryCache:
    """Persistent geometry cache (scene/cache.py): warm loads must skip the
    BVH build and reproduce bit-identical scene arrays."""

    SCENE = """version: 1
scene_parameters {{ output_file_name: "c.pfm" width: 8 height: 8 }}
perspective_camera {{ origin: 0 0 -3 look_at: 0 0 0 fov: 45 }}
material_lambertian {{ name: "m" diffuse: 0.5 0.5 0.5 }}
mesh {{ file: "{ply}" material: "m" translate: 0.1 0.2 0.3 }}
"""

    def _write(self, tmp_path):
        from simplepath_tpu.io.meshgen import icosphere, write_ply
        v, f = icosphere(2)  # 320 tris >= BVH_MIN_TRIS
        ply = tmp_path / "ball.ply"
        write_ply(str(ply), v, f)
        sp = tmp_path / "s.sp"
        sp.write_text(self.SCENE.format(ply=ply.name))
        return str(sp)

    def test_roundtrip_identical(self, tmp_path, monkeypatch):
        from simplepath_tpu import load_scene
        from simplepath_tpu.scene import cache
        monkeypatch.setattr(cache, "CACHE_MIN_TRIS", 0)
        sp = self._write(tmp_path)
        s1 = load_scene(sp)
        assert (tmp_path / ".spcache").is_dir()
        s2 = load_scene(sp)
        for a, b in [(s1.bvh.records, s2.bvh.records),
                     (s1.triangles.v0, s2.triangles.v0),
                     (s1.triangles.n2, s2.triangles.n2),
                     (s1.triangles.material_id, s2.triangles.material_id)]:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bake_only_cache(self, tmp_path, monkeypatch):
        """use_bvh=False loads (the geometry-sharding front door) cache the
        baked triangle tables under a distinct key and round-trip them."""
        from simplepath_tpu import load_scene
        from simplepath_tpu.scene import cache
        monkeypatch.setattr(cache, "CACHE_MIN_TRIS", 0)
        sp = self._write(tmp_path)
        s1 = load_scene(sp, use_bvh=False)
        assert s1.bvh is None or s1.bvh.records is None
        names = os.listdir(tmp_path / ".spcache")
        assert any(n.endswith("_bake.npz") for n in names), names
        s2 = load_scene(sp, use_bvh=False)
        assert s2.bvh is None or s2.bvh.records is None
        np.testing.assert_array_equal(np.asarray(s1.triangles.v0),
                                      np.asarray(s2.triangles.v0))
        # the bake entry must not be served to a BVH load
        s3 = load_scene(sp)
        assert s3.bvh is not None and s3.bvh.records is not None

    def test_forest_cache(self, tmp_path, monkeypatch):
        """shard_scene_geometry(cache_dir=...) persists the sharded forest
        and a warm call reproduces it bit-identically."""
        import jax
        from jax.sharding import Mesh
        from simplepath_tpu import load_scene
        from simplepath_tpu.parallel.geom_shard import (GEOM_AXIS,
                                                        shard_scene_geometry)
        from simplepath_tpu.scene import cache
        monkeypatch.setattr(cache, "CACHE_MIN_TRIS", 0)
        sp = self._write(tmp_path)
        mesh = Mesh(np.asarray(jax.devices()[:2]), (GEOM_AXIS,))
        sc1 = shard_scene_geometry(load_scene(sp, use_bvh=False), mesh,
                                   cache_dir=str(tmp_path))
        names = os.listdir(tmp_path / ".spcache")
        assert len(names) >= 2  # bake entry + forest entry
        sc2 = shard_scene_geometry(load_scene(sp, use_bvh=False), mesh,
                                   cache_dir=str(tmp_path))
        np.testing.assert_array_equal(np.asarray(sc1.bvh.records),
                                      np.asarray(sc2.bvh.records))
        np.testing.assert_array_equal(np.asarray(sc1.triangles.v0),
                                      np.asarray(sc2.triangles.v0))

    def test_invalidated_by_mesh_change(self, tmp_path, monkeypatch):
        import os
        from simplepath_tpu import load_scene
        from simplepath_tpu.io.meshgen import icosphere, write_ply
        from simplepath_tpu.scene import cache
        monkeypatch.setattr(cache, "CACHE_MIN_TRIS", 0)
        sp = self._write(tmp_path)
        s1 = load_scene(sp)
        v, f = icosphere(3)  # different mesh, same filename
        write_ply(str(tmp_path / "ball.ply"), v, f)
        os.utime(str(tmp_path / "ball.ply"))  # ensure mtime moves
        s2 = load_scene(sp)
        assert s2.static.num_triangles == len(f) != s1.static.num_triangles
