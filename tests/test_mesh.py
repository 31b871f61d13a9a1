import os

import jax.numpy as jnp
import numpy as np

from nerfnav_tpu.utils.mesh import (
    extract_geometry,
    marching_tetrahedra,
    save_obj,
    save_ply,
)


def sphere_sdf_field(res=32, radius=10.0):
    lin = np.arange(res, dtype=np.float32)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
    center = (res - 1) / 2
    return radius - np.linalg.norm(g - center, axis=-1)  # >0 inside


class TestMarchingTets:
    def test_sphere_surface(self):
        field = sphere_sdf_field(res=32, radius=10.0)
        verts, faces = marching_tetrahedra(field, 0.0)
        assert len(verts) > 100 and len(faces) > 100
        # every vertex lies (approximately) on the radius-10 sphere
        center = (32 - 1) / 2
        r = np.linalg.norm(verts - center, axis=-1)
        np.testing.assert_allclose(r, 10.0, atol=0.5)
        # faces index valid vertices
        assert faces.max() < len(verts) and faces.min() >= 0

    def test_empty_field(self):
        field = np.zeros((8, 8, 8), np.float32)
        verts, faces = marching_tetrahedra(field, 0.5)
        assert len(verts) == 0 and len(faces) == 0

    def test_watertight_sphere_euler(self):
        """Closed surface: Euler characteristic V - E + F == 2."""
        field = sphere_sdf_field(res=24, radius=8.0)
        verts, faces = marching_tetrahedra(field, 0.0)
        edges = set()
        for a, b, c in faces:
            for e in [(a, b), (b, c), (a, c)]:
                edges.add((min(e), max(e)))
        euler = len(verts) - len(edges) + len(faces)
        assert euler == 2, euler


class TestExtractGeometry:
    def test_from_density_fn(self):
        def density_fn(x):
            return jnp.where(jnp.linalg.norm(x, axis=-1) < 0.5, 100.0, 0.0)

        verts, faces, field = extract_geometry(density_fn, bound=1.0,
                                               resolution=48, threshold=10.0)
        assert len(verts) > 0
        r = np.linalg.norm(verts, axis=-1)
        np.testing.assert_allclose(r, 0.5, atol=0.06)


class TestWriters:
    def test_obj_and_ply(self, tmp_path):
        field = sphere_sdf_field(res=12, radius=4.0)
        verts, faces = marching_tetrahedra(field, 0.0)
        obj = str(tmp_path / "m.obj")
        ply = str(tmp_path / "m.ply")
        save_obj(obj, verts, faces)
        save_ply(ply, verts, faces)
        lines = open(obj).read().splitlines()
        assert sum(1 for l in lines if l.startswith("v ")) == len(verts)
        assert sum(1 for l in lines if l.startswith("f ")) == len(faces)
        header = open(ply).read()
        assert f"element vertex {len(verts)}" in header
