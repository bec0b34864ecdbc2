"""Mesh -> blender-dataset generator (tools/mesh_dataset.py): the GL-free
equivalent of the reference's `rendering/pyrender_data.py` offscreen
pipeline. Covers the PLY/OFF loaders, shading/rasterization, the blender
schema round trip through `data/blender.py`, and the CLI surface."""

import json
import os

import numpy as np
import pytest

from nerface_tpu.tools.mesh_dataset import (
    generate_mesh_dataset,
    load_mesh,
    load_ply_mesh,
    look_at_pose,
    normalize_mesh,
    render_shaded,
    shade_vertices,
    vertex_normals,
)


def _icosahedron():
    """12-vertex icosahedron (closed, convex)."""
    p = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, p, 0], [1, p, 0], [-1, -p, 0], [1, -p, 0],
        [0, -1, p], [0, 1, p], [0, -1, -p], [0, 1, -p],
        [p, 0, -1], [p, 0, 1], [-p, 0, -1], [-p, 0, 1],
    ], np.float64)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int64)
    return verts, faces


def _write_ascii_ply(path, verts, faces):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\ncomment test mesh\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in faces:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def _write_binary_ply(path, verts, faces):
    import struct

    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex %d\n" % len(verts))
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"element face %d\n" % len(faces))
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(struct.pack("<3f", *v))
        for t in faces:
            f.write(struct.pack("<B3i", 3, *t))


class TestMeshIO:
    def test_ply_ascii_binary_agree(self, tmp_path):
        verts, faces = _icosahedron()
        pa = str(tmp_path / "a.ply")
        pb = str(tmp_path / "b.ply")
        _write_ascii_ply(pa, verts, faces)
        _write_binary_ply(pb, verts, faces)
        va, fa = load_ply_mesh(pa)
        vb, fb = load_ply_mesh(pb)
        np.testing.assert_allclose(va, verts, atol=1e-6)
        np.testing.assert_allclose(va, vb, atol=1e-6)
        np.testing.assert_array_equal(fa, faces)
        np.testing.assert_array_equal(fb, faces)

    def test_load_mesh_dispatch(self, tmp_path):
        verts, faces = _icosahedron()
        p = str(tmp_path / "m.ply")
        _write_ascii_ply(p, verts, faces)
        v, f = load_mesh(p)
        assert v.shape == (12, 3) and f.shape == (20, 3)

    def test_normalize(self):
        verts, _ = _icosahedron()
        n = normalize_mesh(verts * 37.0 + 5.0)
        lo, hi = n.min(0), n.max(0)
        np.testing.assert_allclose(lo + hi, 0.0, atol=1e-12)
        assert np.linalg.norm(hi - lo) == pytest.approx(1 / 1.2, rel=1e-9)


class TestCameraAndShading:
    def test_look_at_orthonormal_and_aimed(self):
        rng = np.random.RandomState(0)
        for _ in range(10):
            cam = rng.randn(3)
            cam /= np.linalg.norm(cam)
            pose = look_at_pose(cam)
            R = pose[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
            assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-9)
            # camera -z axis points at the origin
            np.testing.assert_allclose(-R[:, 2], -cam, atol=1e-9)

    def test_vertex_normals_unit_outward(self):
        verts, faces = _icosahedron()
        vn = vertex_normals(verts, faces)
        np.testing.assert_allclose(
            np.linalg.norm(vn, axis=-1), 1.0, atol=1e-9
        )
        # convex solid centered at origin: normals point along vertices
        cos = np.abs(
            (vn * verts / np.linalg.norm(verts, axis=-1, keepdims=True)).sum(-1)
        )
        assert cos.min() > 0.9

    def test_render_shaded_coverage_and_range(self):
        verts, faces = _icosahedron()
        verts = normalize_mesh(verts)
        vcols = shade_vertices(verts, vertex_normals(verts, faces))
        intr = np.array([120.0, 120.0, 32.0, 32.0])
        pose = look_at_pose(np.array([0.0, 1.0, 0.3]))
        img = render_shaded(verts, faces, vcols, pose, intr, 64, 64)
        assert img.shape == (64, 64, 4)
        cov = img[..., 3].mean()
        assert 0.05 < cov < 0.9, cov
        inside = img[img[..., 3] > 0][:, :3]
        assert inside.min() >= 0.0 and inside.max() <= 1.0
        assert inside.std() > 0.01  # actually shaded, not flat


class TestDatasetGeneration:
    def test_blender_roundtrip(self, tmp_path):
        verts, faces = _icosahedron()
        mesh_path = str(tmp_path / "m.ply")
        _write_ascii_ply(mesh_path, verts, faces)
        out = str(tmp_path / "ds")
        counts = generate_mesh_dataset(
            mesh_path, out, n_views=10, im_size=48, focal=90.0, seed=3
        )
        assert counts == {"train": 6, "val": 2, "test": 2}
        for split in ("train", "val", "test"):
            meta = json.load(
                open(os.path.join(out, f"transforms_{split}.json"))
            )
            assert "camera_angle_x" in meta
            assert len(meta["frames"]) == counts[split]

        from nerface_tpu.data.blender import load_blender_data

        ds = load_blender_data(out)
        assert ds.images.shape[0] == 10
        assert ds.images.shape[1:3] == (48, 48)
        assert len(ds.i_train) == 6
        # focal reconstructed from camera_angle_x
        assert ds.focal == pytest.approx(90.0, rel=1e-5)
        # poses are rigid transforms
        for pose in ds.poses:
            R = np.asarray(pose)[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    def test_helix_test_sequence(self, tmp_path):
        verts, faces = _icosahedron()
        mesh_path = str(tmp_path / "m.ply")
        _write_ascii_ply(mesh_path, verts, faces)
        out = str(tmp_path / "ds")
        counts = generate_mesh_dataset(
            mesh_path, out, n_views=10, im_size=32, focal=60.0,
            test_sequence="HELIX", n_views_test=7,
        )
        assert counts["test"] == 7

    def test_cli_mesh_mode(self, tmp_path):
        from nerface_tpu.cli.generate_synthetic import main

        verts, faces = _icosahedron()
        mesh_path = str(tmp_path / "m.ply")
        _write_ascii_ply(mesh_path, verts, faces)
        out = str(tmp_path / "ds")
        main([
            "--target", out, "--mesh", mesh_path, "--size", "32",
            "--n-train", "6", "--n-val", "2", "--n-test", "2",
            "--focal", "60",
        ])
        assert os.path.exists(os.path.join(out, "transforms_train.json"))
